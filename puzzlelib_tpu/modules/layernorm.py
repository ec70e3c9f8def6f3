"""Layer normalization over the last dimension.

Not present in the reference (it ships Batch/Instance/LRN norms only) — added
for the transformer stack. Matches the usual semantics: per-sample
normalization over the feature dim with learnable scale/shift.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


@partial(jax.jit, static_argnames=("epsilon", ))
def _lnForward(x, scale, bias, epsilon):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    norm = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    return (norm * scale + bias).astype(x.dtype)


@partial(jax.jit, static_argnames=("epsilon", ))
def _lnBackward(x, scale, bias, grad, epsilon):
    _, vjp = jax.vjp(lambda xx, ss, bb: _lnForward(xx, ss, bb, epsilon), x, scale, bias)
    return vjp(grad)


class LayerNorm(Module):
    def __init__(self, size, epsilon=1e-5, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.size = size
        self.epsilon = epsilon

        self.setVar("scale", Variable(gpuarray.to_gpu(np.ones(size, np.float32))))
        self.setVar("bias", Variable(gpuarray.to_gpu(np.zeros(size, np.float32))))

    def updateData(self, data):
        self.data = gpuarray.GPUArray(
            _lnForward(data.jax, self.scale.jax, self.bias.jax, self.epsilon)
        )

    def updateGrad(self, grad):
        dx, _, _ = _lnBackward(self.inData.jax, self.scale.jax, self.bias.jax,
                               grad.jax, self.epsilon)
        self.grad = gpuarray.GPUArray(dx)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        _, dScale, dBias = _lnBackward(self.inData.jax, self.scale.jax, self.bias.jax,
                                       grad.jax, self.epsilon)

        self.vars["scale"].grad._write(
            momentum * self.vars["scale"].grad.jax + scale * dScale
        )
        self.vars["bias"].grad._write(
            momentum * self.vars["bias"].grad.jax + scale * dBias
        )

    def checkDataShape(self, shape):
        if shape[-1] != self.size:
            raise ModuleError("Expected last dim %d, got %d" % (self.size, shape[-1]))

    def checkGradShape(self, shape):
        self.checkDataShape(shape)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
