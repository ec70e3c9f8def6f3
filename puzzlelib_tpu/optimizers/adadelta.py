"""Reference: /root/reference/Optimizers/AdaDelta.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import adadeltaKer
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class AdaDelta(Optimizer):
    def __init__(self, rho=0.95, epsilon=1e-6, nodeinfo=None):
        super().__init__(nodeinfo)

        self.rho = None
        self.epsilon = None

        self.setAttr("rho", rho)
        self.setAttr("epsilon", epsilon)

        self.learnRate = 1.0

    def setupState(self, var):
        return {
            "msg": gpuarray.zeros(var.data.shape, dtype=var.data.dtype),
            "msdx": gpuarray.zeros(var.data.shape, dtype=var.data.dtype)
        }

    def updateVar(self, var, state, stream=None):
        adadeltaKer(var.data.dtype)(
            var.data, var.grad, state["msg"], state["msdx"], self.rho, self.epsilon, stream=stream
        )
