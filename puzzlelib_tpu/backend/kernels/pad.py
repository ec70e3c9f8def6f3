"""Reflect-pad dispatch (reference: /root/reference/Backend/Kernels/Pad.py).

Pad formats follow the reference kernels: 1D pad = (lpad, rpad); 2D pad =
(upad, bpad, lpad, rpad).  Tuples of per-axis (lo, hi) pairs are also accepted.
"""

import jax.numpy as jnp

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import pad as _pad


def _toPairs(pad, nd):
    pad = tuple(pad)

    if len(pad) == nd and all(isinstance(p, (tuple, list)) for p in pad):
        return tuple((int(lo), int(hi)) for lo, hi in pad)

    if len(pad) == 2 * nd:
        return tuple((int(pad[2 * i]), int(pad[2 * i + 1])) for i in range(nd))

    if len(pad) == nd:
        return tuple((int(p), int(p)) for p in pad)

    raise ValueError("Bad pad spec %r for %dd padding" % (pad, nd))


def _reflectpad(data, pad):
    pairs = _toPairs(pad, data.ndim - 2)
    return GPUArray(_pad.reflectpad(data.jax, pairs))


def _reflectpadBackward(grad, pad):
    nd = grad.ndim - 2
    pairs = _toPairs(pad, nd)

    inshape = grad.shape[:2] + tuple(grad.shape[2 + i] - pairs[i][0] - pairs[i][1] for i in range(nd))

    x0 = jnp.zeros(inshape, grad.dtype)
    return GPUArray(_pad.reflectpadBackward(grad.jax, x0, pairs))


reflectpad1d = reflectpad2d = _reflectpad
reflectpad1dBackward = reflectpad2dBackward = _reflectpadBackward
