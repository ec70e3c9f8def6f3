"""Reflect padding 1D/2D with exact-adjoint backward
(reference kernels: /root/reference/Cuda/Kernels/Pad.py:145)."""

from functools import partial

import jax
import jax.numpy as jnp


def _reflectCore(x, pad):
    nd = x.ndim - 2
    pads = ((0, 0), (0, 0)) + tuple((pad[i], pad[i]) for i in range(nd)) \
        if len(pad) == nd else ((0, 0), (0, 0)) + tuple(pad)
    return jnp.pad(x, pads, mode="reflect")


@partial(jax.jit, static_argnames=("pad", ))
def reflectpad(x, pad):
    return _reflectCore(x, pad)


@partial(jax.jit, static_argnames=("pad", ))
def reflectpadBackward(grad, inshape_x, pad):
    _, vjp = jax.vjp(lambda xx: _reflectCore(xx, pad), inshape_x)
    return vjp(grad)[0]
