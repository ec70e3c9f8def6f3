"""Upsampling 2D/3D, nearest + linear, forward and exact-adjoint backward
(reference kernels: /root/reference/Cuda/Kernels/Upsample.py).

Nearest repeats each cell ``scale`` times.  Linear matches the reference's
align-corners interpolation (scale factors (in-1)/(out-1)).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _nearestCore(x, scale):
    nd = x.ndim - 2

    for i in range(nd):
        x = jnp.repeat(x, scale[i], axis=2 + i)

    return x


def _linearCore(x, scale):
    nd = x.ndim - 2
    inshape = x.shape[2:]
    outshape = tuple(inshape[i] * scale[i] for i in range(nd))

    xf = x.astype(jnp.float32)

    for i in range(nd):
        insz, outsz = x.shape[2 + i], outshape[i]
        axis = 2 + i

        if insz == 1:
            xf = jnp.repeat(xf, scale[i], axis=axis)
            continue

        # align-corners sampling positions
        pos = jnp.arange(outsz, dtype=jnp.float32) * ((insz - 1) / (outsz - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, insz - 1)
        frac = (pos - lo.astype(jnp.float32))

        shape = [1] * xf.ndim
        shape[axis] = outsz
        frac = frac.reshape(shape)

        xf = jnp.take(xf, lo, axis=axis) * (1 - frac) + jnp.take(xf, hi, axis=axis) * frac

    return xf.astype(x.dtype)


@partial(jax.jit, static_argnames=("scale", "mode"))
def upsample(x, scale, mode="nearest"):
    return _nearestCore(x, scale) if mode == "nearest" else _linearCore(x, scale)


@partial(jax.jit, static_argnames=("scale", "mode"))
def upsampleBackward(grad, x, scale, mode="nearest"):
    core = _nearestCore if mode == "nearest" else _linearCore
    _, vjp = jax.vjp(lambda xx: core(xx, scale), x)
    return vjp(grad)[0]
