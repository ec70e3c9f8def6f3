"""Reflect-pad dispatch (reference: /root/reference/Backend/Kernels/Pad.py)."""

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import pad as _pad


def _reflectpad(data, pad):
    return GPUArray(_pad.reflectpad(data.jax, tuple(pad)))


def _reflectpadBackward(grad, pad):
    import jax.numpy as jnp

    nd = grad.ndim - 2
    inshape = grad.shape[:2] + tuple(grad.shape[2 + i] - 2 * pad[i] for i in range(nd))

    x0 = jnp.zeros(inshape, grad.dtype)
    return GPUArray(_pad.reflectpadBackward(grad.jax, x0, tuple(pad)))


reflectpad1d = reflectpad2d = _reflectpad
reflectpad1dBackward = reflectpad2dBackward = _reflectpadBackward
