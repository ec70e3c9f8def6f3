"""Elementwise sum of a list of equal-shaped inputs.

Parity surface: /root/reference/Modules/Add.py (list-in/one-out protocol,
shared gradient object — ``movesGrad``). One fused n-ary add instead of the
reference's accumulate-into-zeros kernel loop.
"""

from functools import reduce

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.modules.module import ModuleError, Module


class Add(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesGrad = True

    def updateData(self, data):
        self.data = GPUArray(reduce(lambda a, b: a + b, [d.jax for d in data]))

    def updateGrad(self, grad):
        # the sum's gradient fans out unchanged: every branch shares one object
        self.grad = [grad] * len(self.inData)

    def checkDataShape(self, shapes):
        for shape in shapes:
            if shape != shapes[0]:
                raise ModuleError("Shape %s is not equal to initial shape %s" % (shape, shapes[0]))

    def dataShapeFrom(self, shape):
        return shape[0]

    def gradShapeFrom(self, shape):
        return [shape] * len(self.inData)

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
