"""Reference: /root/reference/Optimizers/RMSProp.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import rmspropKer
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class RMSProp(Optimizer):
    def __init__(self, learnRate=1e-3, factor=0.9, epsilon=1e-5, nodeinfo=None):
        super().__init__(nodeinfo)

        self.factor = None
        self.epsilon = None

        self.setAttr("learnRate", learnRate)
        self.setAttr("factor", factor)
        self.setAttr("epsilon", epsilon)

    def setupState(self, var):
        return {"ms": gpuarray.zeros(var.data.shape, dtype=var.data.dtype)}

    def updateVar(self, var, state, stream=None):
        rmspropKer(var.data.dtype)(
            var.data, var.grad, state["ms"], self.learnRate * var.learnRate, self.factor, self.epsilon,
            stream=stream
        )
