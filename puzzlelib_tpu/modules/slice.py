"""Subtensor extraction module.

API parity target: /root/reference/Modules/Slice.py — configure with
``Slice()[:, 1:-1]`` syntax; backward scatters the gradient into a zero tensor
of the input shape.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.modules.module import ModuleError, Module


class Slice(Module):
    def __init__(self, slc=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.slc = slc
        self.inshape = None

    def __getitem__(self, slc):
        self.slc = slc if isinstance(slc, tuple) else (slc, )
        return self

    def _requireSlice(self):
        if self.slc is None:
            raise ModuleError("Slice parameter is not initialized")

    def updateData(self, data):
        self.inshape = data.shape
        self.data = data[self.slc].copy(allocator=memPool)

    def updateGrad(self, grad):
        full = gpuarray.zeros(self.inshape, dtype=np.float32, allocator=memPool)
        full[self.slc] = grad
        self.grad = full

    def dataShapeFrom(self, shape):
        self._requireSlice()

        # unspecified trailing axes pass through whole
        window = self.slc + (slice(None), ) * (len(shape) - len(self.slc))

        return tuple(len(range(*slc.indices(extent))) for slc, extent in zip(window, shape))

    def checkDataShape(self, shape):
        self._requireSlice()

        if len(shape) < len(self.slc):
            raise ModuleError("Expected at least %d data dimensions, %d were given" % (len(self.slc), len(shape)))

    def gradShapeFrom(self, shape):
        return self.inshape

    def checkGradShape(self, shape):
        if shape != self.data.shape:
            raise ModuleError("Grad shape %s is inconsistent with output data shape %s" % (shape, self.data.shape))
