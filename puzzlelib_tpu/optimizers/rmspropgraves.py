"""Reference: /root/reference/Optimizers/RMSPropGraves.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import rmspropGravesKer
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class RMSPropGraves(Optimizer):
    def __init__(self, learnRate=1e-4, alpha=0.95, momRate=0.9, epsilon=1e-4, nodeinfo=None):
        super().__init__(nodeinfo)

        self.alpha = None
        self.momRate = None
        self.epsilon = None

        self.setAttr("learnRate", learnRate)
        self.setAttr("alpha", alpha)
        self.setAttr("momRate", momRate)
        self.setAttr("epsilon", epsilon)

    def setupState(self, var):
        return {
            "mg": gpuarray.zeros(var.data.shape, dtype=var.data.dtype),
            "ms": gpuarray.zeros(var.data.shape, dtype=var.data.dtype),
            "delta": gpuarray.zeros(var.data.shape, dtype=var.data.dtype)
        }

    def updateVar(self, var, state, stream=None):
        rmspropGravesKer(var.data.dtype)(
            var.data, var.grad, state["mg"], state["ms"], state["delta"], self.learnRate * var.learnRate,
            self.alpha, self.momRate * var.momRate, self.epsilon, stream=stream
        )
