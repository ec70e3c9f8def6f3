"""Reference: /root/reference/Optimizers/AdaGrad.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import adagradKer
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class AdaGrad(Optimizer):
    def __init__(self, learnRate=1e-3, epsilon=1e-8, nodeinfo=None):
        super().__init__(nodeinfo)

        self.epsilon = None

        self.setAttr("learnRate", learnRate)
        self.setAttr("epsilon", epsilon)

    def setupState(self, var):
        return {"h": gpuarray.zeros(var.data.shape, dtype=var.data.dtype)}

    def updateVar(self, var, state, stream=None):
        adagradKer(var.data.dtype)(
            var.data, var.grad, state["h"], self.learnRate * var.learnRate, self.epsilon, stream=stream
        )
