"""Spatial transformer (affine grid sample).

API parity target: /root/reference/Modules/SpatialTf.py — input is the pair
``(data, transform)`` where transform is a batch of 2x3 affine matrices; the
backward pass returns gradients for both, using the sampling grid cached from
the forward pass (cuDNN keeps the same grid; here it is a jnp tensor).
"""

from puzzlelib_tpu.backend.dnn import spatialTf, spatialTfBackward
from puzzlelib_tpu.modules.module import ModuleError, Module


class SpatialTf(Module):
    def __init__(self, shape=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.shape = shape
        self.grid = None

    def updateData(self, data):
        images, transform = data
        needGrid = self.train  # backward re-samples through the saved grid

        result = spatialTf(images, transform, outshape=self.shape, getGrid=needGrid)
        if needGrid:
            self.data, self.grid = result
        else:
            self.data = result

    def updateGrad(self, grad):
        images = self.inData[0]
        self.grad = spatialTfBackward(grad, images, self.grid)

    def checkDataShape(self, shapes):
        dshape, tshape = shapes

        if tshape[1:] != (2, 3) or len(tshape) != 3:
            raise ModuleError("Bad transform shape (%s was given)" % (tshape, ))

        if len(dshape) != 4:
            raise ModuleError("Data must be 4d tensor")

        if dshape[0] != tshape[0]:
            raise ModuleError("Inconsistency in transform and data batch size (%d in transform vs %d in data)" %
                              (tshape[0], dshape[0]))

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        expected = self.shape if self.shape is not None else self.inData[0].shape
        given = shape[1:] if self.shape is not None else shape

        if given != expected:
            raise ModuleError("Bad grad shape (was given %s, expected %s)" % (given, expected))

    def dataShapeFrom(self, shapes):
        dshape = shapes[0]
        return dshape if self.shape is None else (dshape[0], ) + self.shape

    def gradShapeFrom(self, shape):
        batch = shape[0]
        return (batch, ) + self.inData[0].shape[1:], (batch, 2, 3)

    def reset(self):
        super().reset()
        self.grid = None
