"""Reference: /root/reference/Modules/NoiseInjector.py."""

from enum import Enum

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import fillUniform, fillNormal, copy, memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import mulKer, addKer
from puzzlelib_tpu.modules.module import Module


class InjectMode(str, Enum):
    add = "add"
    mul = "mul"


class NoiseType(str, Enum):
    gaussian = "gaussian"
    uniform = "uniform"


class NoiseInjector(Module):
    def __init__(self, mode="add", noisetype="uniform", params=(0.0, 1.0), rng=None, inplace=False, slicing=None,
                 name=None):
        super().__init__(name)
        self.registerBlueprint(locals(), exclude=["rng"])

        from puzzlelib_tpu.rng import globalRng

        self.rng = globalRng if rng is None else rng
        self.mode = InjectMode(mode)
        self.type = NoiseType(noisetype)
        self.params = params

        self.slice = slicing
        self.rands = None

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

    def updateData(self, data):
        if self.train:
            rands = gpuarray.empty(data.shape, dtype=np.float32, allocator=memPool)

            if self.type == NoiseType.uniform:
                a, b = self.params
                fillUniform(rands, a, b, self.rng)

            elif self.type == NoiseType.gaussian:
                mean, sigma = self.params
                fillNormal(rands, mean, sigma, self.rng)

            else:
                raise NotImplementedError(self.type)

            self.rands = rands if data.dtype == np.float32 else rands.astype(data.dtype)

            self.data = data if self.inplace else gpuarray.empty(data.shape, dtype=data.dtype, allocator=memPool)

            if self.mode == InjectMode.add:
                addKer(data.dtype)(self.data, data, 1, self.rands, 1, slice=self.slice)
            elif self.mode == InjectMode.mul:
                mulKer(data.dtype)(self.data, data, self.rands, slice=self.slice)
            else:
                raise NotImplementedError(self.mode)

        else:
            self.data = data

    def updateGrad(self, grad):
        if self.mode == InjectMode.mul:
            self.grad = grad if self.inplace else gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
            mulKer(grad.dtype)(self.grad, grad, self.rands, slice=self.slice)

        elif self.mode == InjectMode.add:
            self.grad = grad if self.inplace else copy(None, grad)

        else:
            raise NotImplementedError(self.mode)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def reset(self):
        super().reset()
        self.rands = None

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
