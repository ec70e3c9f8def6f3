"""Elementwise product of a list of equal-shaped inputs.

Parity surface: /root/reference/Modules/Mul.py (list-in/one-out protocol,
per-branch gradients). Forward is one fused product; each branch gradient is
one fused leave-one-out product — XLA fuses the whole family into a couple of
elementwise kernels instead of the reference's in-place kernel loop.
"""

from functools import reduce

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.modules.module import ModuleError, Module


def _product(tensors):
    return reduce(lambda a, b: a * b, tensors)


class Mul(Module):
    def updateData(self, data):
        self.data = GPUArray(_product([d.jax for d in data]))

    def updateGrad(self, grad):
        xs = [d.jax for d in self.inData]

        # d/dx_i = grad * prod of the other branches
        self.grad = [
            GPUArray(_product([grad.jax] + xs[:i] + xs[i + 1:]))
            for i in range(len(xs))
        ]

    def checkDataShape(self, shapes):
        for shape in shapes:
            if shape != shapes[0]:
                raise ModuleError("Shape %s is not equal to initial shape %s" % (shape, shapes[0]))

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return [shape] * len(self.inData)

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
