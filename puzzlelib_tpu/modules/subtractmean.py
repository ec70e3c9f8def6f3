"""Subtractive normalization: remove the local window mean from each pixel.

Parity surface: /root/reference/Modules/SubtractMean.py (odd window contract,
``includePad`` mean mode). The mean comes from the avg-pool op; the subtract
in both directions is fused arithmetic on the device arrays rather than the
reference's ravel/axpy dance.
"""

from puzzlelib_tpu.backend.dnn import PoolMode, poolNd, poolNdBackward
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.modules.module import ModuleError, Module


class SubtractMean(Module):
    def __init__(self, size=5, includePad=True, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        if size % 2 != 1 or size == 1:
            raise ModuleError("Subtractive norm size must be odd and > 1")

        self.size = self.repeat(size, 2)
        self.pad = (self.size[0] // 2, self.size[1] // 2)
        self.mode = PoolMode.avgWithPad if includePad else PoolMode.avgNoPad

        self.means = None
        self.workspace = None

    def updateData(self, data):
        self.means, self.workspace = poolNd(
            data, size=self.size, stride=(1, 1), pad=self.pad, mode=self.mode, test=not self.train
        )
        self.data = GPUArray(data.jax - self.means.jax)

    def updateGrad(self, grad):
        meansGrad = poolNdBackward(
            self.inData, self.means, grad, self.workspace,
            size=self.size, stride=(1, 1), pad=self.pad, mode=self.mode
        )
        self.grad = GPUArray(grad.jax - meansGrad.jax)

    def reset(self):
        super().reset()
        self.means = self.workspace = None

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")
