"""Max-unpooling tied to a MaxPool2D module's argmax mask.

Parity surface: /root/reference/Modules/MaxUnpool2D.py — ctor takes the
pooling module (excluded from the blueprint), forces its mask on, and scatters
through the recorded flat argmax indices (``ops.pool``: a jitted scatter, the
TPU answer to the reference's atomic unpool kernel).
"""

from puzzlelib_tpu.backend.kernels import pool as Pool
from puzzlelib_tpu.modules.module import ModuleError, Module


def _unpooledHW(pool, pooledHW):
    """Spatial extent before pooling, from the tied module's geometry."""
    return tuple((n - 1) * stride + size - 2 * pad for n, size, stride, pad in
                 zip(pooledHW, pool.size, pool.stride, pool.pad))


def _pooledHW(pool, fullHW):
    """Spatial extent after pooling, inverse of :func:`_unpooledHW`."""
    return tuple((n + 2 * pad - size) // stride + 1 for n, size, stride, pad in
                 zip(fullHW, pool.size, pool.stride, pool.pad))


class MaxUnpool2D(Module):
    def __init__(self, maxpool2d, name=None):
        super().__init__(name)
        self.registerBlueprint(locals(), exclude=["maxpool2d"])

        maxpool2d.withMask = True
        self.maxpool2d = maxpool2d

    def updateData(self, data):
        pool = self.maxpool2d
        self.data = Pool.maxunpool2d(data, pool.inData.shape, pool.mask)

    def updateGrad(self, grad):
        pool = self.maxpool2d
        self.grad = Pool.maxunpool2dBackward(grad, pool.data.shape, pool.mask)

    def dataShapeFrom(self, shape):
        return shape[:2] + _unpooledHW(self.maxpool2d, shape[2:])

    def gradShapeFrom(self, shape):
        return shape[:2] + _pooledHW(self.maxpool2d, shape[2:])

    def checkDataShape(self, shape):
        maskShape = self.maxpool2d.mask.shape
        if shape != maskShape:
            raise ModuleError("Data shape (current %s) must be equal to connected MaxPool2D mask shape (%s)" %
                              (shape, maskShape))

    def checkGradShape(self, shape):
        pooledInput = self.maxpool2d.inData.shape
        if shape != pooledInput:
            raise ModuleError("Grad shape (current %s) must be equal to connected MaxPool2D data shape (%s)" %
                              (shape, pooledInput))
