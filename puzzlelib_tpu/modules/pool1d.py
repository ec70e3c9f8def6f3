"""1D pooling base (reference: /root/reference/Modules/Pool1D.py).

Implemented over the Nd pooling primitive with a singleton width axis."""

from puzzlelib_tpu.backend.dnn import poolNd, poolNdBackward
from puzzlelib_tpu.modules.module import ModuleError, Module


class Pool1D(Module):
    def __init__(self, size=2, stride=2, pad=0, name=None):
        super().__init__(name)

        self.gradUsesOutData = True

        self.size = size
        self.stride = stride
        self.pad = pad

        self.workspace = None
        self.mode = None

    def dataShapeFrom(self, shape):
        batchsize, maps, insize = shape
        outsize = (insize + 2 * self.pad - self.size) // self.stride + 1

        return batchsize, maps, outsize

    def checkDataShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Data must be 3d tensor")

        if shape[2] + 2 * self.pad < self.size:
            raise ModuleError("Data size is too small (got %d, expected at least %d)" %
                              (shape[2] + 2 * self.pad, self.size))

    def gradShapeFrom(self, shape):
        batchsize, maps, outsize = shape
        insize = (outsize - 1) * self.stride - 2 * self.pad + self.size

        return batchsize, maps, insize

    def checkGradShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Grad must be 3d tensor")

    def updateData(self, data):
        indata = data.reshape(*data.shape, 1)
        outdata, self.workspace = poolNd(
            indata, size=(self.size, 1), stride=(self.stride, 1), pad=(self.pad, 0),
            mode=self.mode, test=not self.train
        )
        self.data = outdata.reshape(outdata.shape[:3])

    def updateGrad(self, grad):
        indata = self.inData.reshape(*self.inData.shape, 1)
        outdata = self.data.reshape(*self.data.shape, 1)
        outgrad = grad.reshape(*grad.shape, 1)

        ingrad = poolNdBackward(indata, outdata, outgrad, self.workspace,
                                size=(self.size, 1), stride=(self.stride, 1), pad=(self.pad, 0), mode=self.mode)
        self.grad = ingrad.reshape(ingrad.shape[:3])

    def reset(self):
        super().reset()
        self.workspace = None

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
