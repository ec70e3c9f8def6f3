"""Depth concatenation of differently-sized maps, center-padded to the
largest spatial extent.

Parity surface: /root/reference/Modules/DepthConcat.py. The pad+concat (and
the slicing split on the way back) is one fused XLA program per direction in
``ops.memory``, reached through the backend Memory slots.
"""

from puzzlelib_tpu.backend import memory as Memory
from puzzlelib_tpu.modules.module import ModuleError, Module


def _enclosingShape(shapes):
    """(batch, sum of depths, max h, max w) over the input map shapes."""
    return (shapes[0][0], sum(s[1] for s in shapes),
            max(s[2] for s in shapes), max(s[3] for s in shapes))


class DepthConcat(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesData = True

    def updateData(self, data):
        self.data = Memory.depthConcat(data)

    def updateGrad(self, grad):
        self.grad = Memory.depthSplit(grad, self.inData)

    def dataShapeFrom(self, shapes):
        return _enclosingShape(shapes)

    def gradShapeFrom(self, shape):
        return [data.shape for data in self.inData]

    def checkDataShape(self, shapes):
        if not isinstance(shapes, list):
            raise ModuleError("Data must be list of tensors")

        for shape in shapes:
            if len(shape) != 4:
                raise ModuleError("Data must consist of 4d tensors")

            if shape[0] != shapes[0][0]:
                raise ModuleError("Inconsistency in batch size")

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        expected = _enclosingShape([data.shape for data in self.inData])
        if shape != expected:
            raise ModuleError("Bad grad shape (%s given, %s expected)" % (shape, expected))
