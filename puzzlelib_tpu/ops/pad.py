"""Reflect padding 1D/2D with exact-adjoint backward
(reference kernels: /root/reference/Cuda/Kernels/Pad.py:145)."""

from functools import partial

import jax
import jax.numpy as jnp


def _reflectCore(x, pad):
    # pad is a tuple of per-spatial-axis (lo, hi) pairs
    pads = ((0, 0), (0, 0)) + tuple(tuple(p) for p in pad)
    return jnp.pad(x, pads, mode="reflect")


@partial(jax.jit, static_argnames=("pad", ))
def reflectpad(x, pad):
    return _reflectCore(x, pad)


@partial(jax.jit, static_argnames=("pad", ))
def reflectpadBackward(grad, inshape_x, pad):
    _, vjp = jax.vjp(lambda xx: _reflectCore(xx, pad), inshape_x)
    return vjp(grad)[0]
