"""Reference: /root/reference/Modules/Cast.py."""

from enum import Enum

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.modules.module import ModuleError, Module


class DataType(str, Enum):
    float32 = "float32"
    float16 = "float16"
    bfloat16 = "bfloat16"


class Cast(Module):
    def __init__(self, intype, outtype, name=None):
        super().__init__(name)

        intype, outtype = self.dataTypeToNumpy(intype), self.dataTypeToNumpy(outtype)
        self.registerBlueprint(locals())

        self.intype, self.outtype = intype, outtype

    def updateData(self, data):
        if self.intype != self.outtype:
            self.data = gpuarray.GPUArray(data.jax.astype(self._np(self.outtype)))
        else:
            self.data = data

    def updateGrad(self, grad):
        if self.intype != self.outtype:
            self.grad = gpuarray.GPUArray(grad.jax.astype(self._np(self.intype)))
        else:
            self.grad = grad

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def checkDataType(self, dtype):
        if np.dtype(dtype) != self._np(self.intype):
            raise ModuleError("Expected dtype %s, got %s" % (self.intype, dtype))

    def checkGradType(self, dtype):
        if np.dtype(dtype) != self._np(self.outtype):
            raise ModuleError("Expected dtype %s, got %s" % (self.outtype, dtype))

    @staticmethod
    def _np(T):
        if T == DataType.bfloat16:
            import jax.numpy as jnp
            return np.dtype(jnp.bfloat16)

        return np.dtype(str(T.value))

    @staticmethod
    def dataTypeToNumpy(T):
        if isinstance(T, DataType):
            return T

        name = np.dtype(T).name if not isinstance(T, str) else T
        return DataType(name)
