"""Indexed max-pool / unpool dispatch (reference: /root/reference/Backend/Kernels/Pool.py)."""

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import pool as _pool


def maxpool2d(data, size, stride, pad):
    out, mask = _pool.maxpool2dWithIndex(data.jax, tuple(size), tuple(stride), tuple(pad))
    return GPUArray(out), GPUArray(mask)


def maxpool2dBackward(grad, origshape, mask, size, stride, pad):
    result = _pool.maxunpool2d(grad.jax, mask.jax, tuple(origshape))
    return GPUArray(result)


def maxunpool2d(data, origshape, mask):
    return GPUArray(_pool.maxunpool2d(data.jax, mask.jax, tuple(origshape)))


def maxunpool2dBackward(grad, poolshape, mask):
    return GPUArray(_pool.maxunpool2dBackward(grad.jax, mask.jax))
