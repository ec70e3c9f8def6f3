"""Reference: /root/reference/Optimizers/SGD.py."""

from puzzlelib_tpu.backend.kernels.elementwise import toVectorAddVectorKer
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class SGD(Optimizer):
    def __init__(self, learnRate=1e-3, nodeinfo=None):
        super().__init__(nodeinfo)
        self.setAttr("learnRate", learnRate)

    def updateVar(self, var, state, stream=None):
        toVectorAddVectorKer(var.data.dtype)(var.data, var.grad, self.learnRate * var.learnRate, stream=stream)
