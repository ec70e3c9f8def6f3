"""Reference: /root/reference/Optimizers/NesterovSGD.py."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import nesterovMomSGDKer
from puzzlelib_tpu.optimizers.sgd import SGD


class NesterovSGD(SGD):
    def __init__(self, learnRate=1e-3, momRate=0.9, nodeinfo=None):
        super().__init__(learnRate, nodeinfo)

        self.momRate = None
        self.setAttr("momRate", momRate)

    def setupState(self, var):
        return {"mom": gpuarray.zeros(var.data.shape, dtype=var.data.dtype)}

    def updateVar(self, var, state, stream=None):
        nesterovMomSGDKer(var.data.dtype)(
            var.data, var.grad, state["mom"], self.learnRate * var.learnRate, self.momRate * var.momRate,
            stream=stream
        )
