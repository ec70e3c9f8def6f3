"""General axes permutation.

Parity surface: /root/reference/Modules/Transpose.py. The backward applies
the inverse permutation (computed by argsort instead of the reference's
index-writing loop).
"""

import numpy as np

from puzzlelib_tpu.backend import memory as Memory
from puzzlelib_tpu.modules.module import ModuleError, Module


class Transpose(Module):
    def __init__(self, axes=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.axes = axes
        self.invaxes = None if axes is None else [int(i) for i in np.argsort(axes)]

    def updateData(self, data):
        self.data = Memory.transpose(data, self.axes)

    def updateGrad(self, grad):
        self.grad = Memory.transpose(grad, self.invaxes)

    def _requireRank(self, shape, what):
        if self.axes is not None and len(shape) != len(self.axes):
            raise ModuleError("%s dimension needs to be %d, (%s has %d)" %
                              (what, len(self.axes), what.lower(), len(shape)))

    def checkDataShape(self, shape):
        self._requireRank(shape, "Data")

    def checkGradShape(self, shape):
        self._requireRank(shape, "Grad")

    def dataShapeFrom(self, shape):
        return tuple(shape[axis] for axis in self.axes)

    def gradShapeFrom(self, shape):
        return tuple(shape[axis] for axis in self.invaxes)

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
