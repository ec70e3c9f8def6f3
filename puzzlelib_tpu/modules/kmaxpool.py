"""Top-k pooling along an axis (reference: /root/reference/Modules/KMaxPool.py).

The reference runs this on the host with numpy argpartition; here it is a
device-side jitted top-k (values ordered ascending by value along the axis,
preserving the reference's output order) with scatter backward.
"""

from functools import partial

import jax
import jax.numpy as jnp

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.modules.module import ModuleError, Module


@partial(jax.jit, static_argnames=("topk", "axis"))
def _kmaxForward(x, topk, axis):
    moved = jnp.moveaxis(x, axis, -1)

    val, idx = jax.lax.top_k(moved, topk)       # descending by value
    order = jnp.argsort(idx, axis=-1)           # reference keeps original positions sorted by... value rank

    # reference: indices of topk sorted by value ascending
    val = val[..., ::-1]
    idx = idx[..., ::-1]

    return jnp.moveaxis(val, -1, axis), jnp.moveaxis(idx, -1, axis), order


@partial(jax.jit, static_argnames=("axis", "axissize"))
def _kmaxBackward(grad, idx, axis, axissize):
    moved = jnp.moveaxis(grad, axis, -1)
    movedIdx = jnp.moveaxis(idx, axis, -1)

    flatShape = (-1, moved.shape[-1])
    flatGrad = moved.reshape(flatShape)
    flatIdx = movedIdx.reshape(flatShape)

    out = jnp.zeros((flatGrad.shape[0], axissize), grad.dtype)
    out = out.at[jnp.arange(flatGrad.shape[0])[:, None], flatIdx].add(flatGrad)

    out = out.reshape(moved.shape[:-1] + (axissize, ))
    return jnp.moveaxis(out, -1, axis)


class KMaxPool(Module):
    def __init__(self, topk, axis, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.topk = topk
        self.axis = axis
        self.indices = None

    def updateData(self, data):
        out, idx, _ = _kmaxForward(data.jax, self.topk, self.axis)

        self.indices = gpuarray.GPUArray(idx)
        self.data = gpuarray.GPUArray(out)

    def updateGrad(self, grad):
        self.grad = gpuarray.GPUArray(
            _kmaxBackward(grad.jax, self.indices.jax, self.axis, self.inData.shape[self.axis])
        )

    def checkDataShape(self, shape):
        if self.axis >= len(shape):
            raise ModuleError("Data dimension needs to be at least %d, (data has %d)" % (self.axis + 1, len(shape)))

        if shape[self.axis] < self.topk:
            raise ModuleError("Data topk axis is too small (got %d, expected at least %d)" %
                              (shape[self.axis], self.topk))

    def checkGradShape(self, shape):
        if self.axis >= len(shape):
            raise ModuleError("Grad dimension needs to be at least %d, (grad has %d)" % (self.axis + 1, len(shape)))

        if shape[self.axis] != self.topk:
            raise ModuleError("Grad topk axis is wrong (got %d, expected exactly %d)" % (shape[self.axis], self.topk))

    def dataShapeFrom(self, shape):
        return shape[:self.axis] + (self.topk, ) + shape[self.axis + 1:]

    def gradShapeFrom(self, shape):
        return shape[:self.axis] + (self.inData.shape[self.axis], ) + shape[self.axis + 1:]

    def reset(self):
        super().reset()
        self.indices = None
