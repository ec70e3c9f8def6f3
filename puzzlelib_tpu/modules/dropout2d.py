"""Per-map dropout (reference: /root/reference/Modules/Dropout2D.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import dropout2dKer
from puzzlelib_tpu.modules.dropout import Dropout


class Dropout2D(Dropout):
    def __init__(self, p=0.5, rng=None, slicing=None, inplace=False, name=None):
        super().__init__(p, rng, slicing, inplace, name)
        self.mapsize = None

    def updateData(self, data):
        if self.train:
            self.data = data if self.inplace else gpuarray.empty(data.shape, dtype=data.dtype, allocator=memPool)

            batchsize, maps = data.shape[:2]
            self.mapsize = int(np.prod(data.shape[2:]))

            self.rands = self._drawRands(batchsize * maps).reshape(batchsize, maps)

            p = 1.0 - self.p
            self.partition = np.uint32(int(p * np.iinfo(np.uint32).max))

            dropout2dKer(data.dtype)(self.data, data, self.rands, self.partition, np.float32(p), self.mapsize,
                                     slice=self.slice)
        else:
            self.data = data

    def updateGrad(self, grad):
        if self.train:
            self.grad = grad if self.inplace else gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
            dropout2dKer(grad.dtype)(self.grad, grad, self.rands, self.partition, np.float32(1.0 - self.p),
                                     self.mapsize)
        else:
            self.grad = grad
