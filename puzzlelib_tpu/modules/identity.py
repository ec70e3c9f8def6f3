"""Reference: /root/reference/Modules/Identity.py."""

from puzzlelib_tpu.modules.module import Module


class Identity(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesData = True
        self.movesGrad = True

    def updateData(self, data):
        self.data = data

    def updateGrad(self, grad):
        self.grad = grad

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.calctype = T
