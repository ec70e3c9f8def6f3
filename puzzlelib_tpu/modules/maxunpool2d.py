"""Reference: /root/reference/Modules/MaxUnpool2D.py."""

from puzzlelib_tpu.backend.kernels import pool as Pool
from puzzlelib_tpu.modules.module import ModuleError, Module


class MaxUnpool2D(Module):
    def __init__(self, maxpool2d, name=None):
        super().__init__(name)
        self.registerBlueprint(locals(), exclude=["maxpool2d"])

        self.maxpool2d = maxpool2d
        self.maxpool2d.withMask = True

    def updateData(self, data):
        self.data = Pool.maxunpool2d(data, self.maxpool2d.inData.shape, self.maxpool2d.mask)

    def updateGrad(self, grad):
        self.grad = Pool.maxunpool2dBackward(grad, self.maxpool2d.data.shape, self.maxpool2d.mask)

    def dataShapeFrom(self, shape):
        batchsize, maps, inh, inw = shape

        hsize, wsize = self.maxpool2d.size
        padh, padw = self.maxpool2d.pad
        hstride, wstride = self.maxpool2d.stride

        outh = (inh - 1) * hstride - 2 * padh + hsize
        outw = (inw - 1) * wstride - 2 * padw + wsize

        return batchsize, maps, outh, outw

    def checkDataShape(self, shape):
        if shape != self.maxpool2d.mask.shape:
            raise ModuleError("Data shape (current %s) must be equal to connected MaxPool2D mask shape (%s)" %
                              (shape, self.maxpool2d.mask.shape))

    def gradShapeFrom(self, shape):
        batchsize, maps, outh, outw = shape

        hsize, wsize = self.maxpool2d.size
        padh, padw = self.maxpool2d.pad
        hstride, wstride = self.maxpool2d.stride

        inh = (outh + 2 * padh - hsize) // hstride + 1
        inw = (outw + 2 * padw - wsize) // wstride + 1

        return batchsize, maps, inh, inw

    def checkGradShape(self, shape):
        if shape != self.maxpool2d.inData.shape:
            raise ModuleError("Grad shape (current %s) must be equal to connected MaxPool2D data shape (%s)" %
                              (shape, self.maxpool2d.inData.shape))
