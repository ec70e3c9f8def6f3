"""Upsample dispatch (reference: /root/reference/Backend/Kernels/Upsample.py)."""

import jax.numpy as jnp

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import upsample as _up


def _scaleTuple(scale, nd):
    return (scale, ) * nd if isinstance(scale, int) else tuple(scale)


def upsample2d(data, scale, mode="nearest"):
    return GPUArray(_up.upsample(data.jax, _scaleTuple(scale, 2), mode=mode))


def upsample2dBackward(grad, scale, mode="nearest"):
    scale = _scaleTuple(scale, 2)
    inshape = grad.shape[:2] + tuple(grad.shape[2 + i] // scale[i] for i in range(2))

    x0 = jnp.zeros(inshape, grad.dtype)
    return GPUArray(_up.upsampleBackward(grad.jax, x0, scale, mode=mode))


def upsample3d(data, scale, mode="nearest"):
    return GPUArray(_up.upsample(data.jax, _scaleTuple(scale, 3), mode=mode))


def upsample3dBackward(grad, scale, mode="nearest"):
    scale = _scaleTuple(scale, 3)
    inshape = grad.shape[:2] + tuple(grad.shape[2 + i] // scale[i] for i in range(3))

    x0 = jnp.zeros(inshape, grad.dtype)
    return GPUArray(_up.upsampleBackward(grad.jax, x0, scale, mode=mode))
