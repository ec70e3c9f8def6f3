"""Elementwise activation module (reference: /root/reference/Modules/Activation.py)."""

from enum import Enum

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import (
    sigmoidKer, sigmoidDerKer, tanhKer, tanhDerKer, reluKer, reluDerKer,
    leakyReluKer, leakyReluDerKer, eluKer, eluDerKer,
    softPlusKer, softPlusDerKer, clipKer, clipDerKer
)
from puzzlelib_tpu.modules.module import ModuleError, Module


class ActivationType(str, Enum):
    sigmoid = "sigmoid"
    tanh = "tanh"
    relu = "relu"
    leakyRelu = "leakyRelu"
    elu = "elu"
    softPlus = "softPlus"
    clip = "clip"


sigmoid = ActivationType.sigmoid
tanh = ActivationType.tanh
relu = ActivationType.relu
leakyRelu = ActivationType.leakyRelu
elu = ActivationType.elu
softPlus = ActivationType.softPlus
clip = ActivationType.clip


class Activation(Module):
    def __init__(self, activation, slc=None, inplace=False, name=None, args=()):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.gradUsesOutData = True
        self.inplace = inplace

        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        activation = ActivationType(activation)

        self.actFunc, self.actFuncDer = {
            ActivationType.sigmoid: (sigmoidKer, sigmoidDerKer),
            ActivationType.tanh: (tanhKer, tanhDerKer),
            ActivationType.relu: (reluKer, reluDerKer),
            ActivationType.leakyRelu: (leakyReluKer, leakyReluDerKer),
            ActivationType.elu: (eluKer, eluDerKer),
            ActivationType.softPlus: (softPlusKer, softPlusDerKer),
            ActivationType.clip: (clipKer, clipDerKer)
        }[activation]

        self.activation = activation
        self.slc = slc

        self.actArgs = args if len(args) > 0 else {
            ActivationType.leakyRelu: (0.01, ),
            ActivationType.elu: (1.0, ),
            ActivationType.clip: (0.0, 6.0)
        }.get(activation, ())

    def updateData(self, data):
        self.data = data if self.inplace else gpuarray.empty(data.shape, dtype=data.dtype, allocator=memPool)
        self.actFunc(data.dtype)(self.data, data, *self.actArgs, slice=self.slc)

    def updateGrad(self, grad):
        self.grad = grad if self.inplace else gpuarray.empty(grad.shape, dtype=grad.dtype, allocator=memPool)
        self.actFuncDer(grad.dtype)(self.grad, grad, self.data, *self.actArgs, slice=self.slc)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
