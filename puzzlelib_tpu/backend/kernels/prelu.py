"""PRelu dispatch (reference: /root/reference/Backend/Kernels/PRelu.py,
kernels /root/reference/Cuda/Kernels/PRelu.py:60)."""

from functools import partial

import jax
import jax.numpy as jnp

from puzzlelib_tpu.tensor import GPUArray


@partial(jax.jit, static_argnames=("sharedMaps", ))
def _preluCore(x, slopes, sharedMaps):
    if sharedMaps:
        a = slopes.reshape((1, ) * x.ndim)
    else:
        a = slopes.reshape((1, slopes.size) + (1, ) * (x.ndim - 2))

    return jnp.where(x > 0, x, x * a.astype(x.dtype))


@partial(jax.jit, static_argnames=("sharedMaps", ))
def _preluBackwardDataCore(grad, slopes, x, sharedMaps):
    if sharedMaps:
        a = slopes.reshape((1, ) * x.ndim)
    else:
        a = slopes.reshape((1, slopes.size) + (1, ) * (x.ndim - 2))

    return grad * jnp.where(x > 0, jnp.asarray(1, grad.dtype), a.astype(grad.dtype))


@partial(jax.jit, static_argnames=("sharedMaps", ))
def _preluBackwardParamsCore(x, grad, sharedMaps):
    contrib = jnp.where(x > 0, 0.0, x.astype(jnp.float32) * grad.astype(jnp.float32))

    if sharedMaps:
        return jnp.sum(contrib).reshape(1).astype(grad.dtype)

    axes = (0, ) + tuple(range(2, x.ndim))
    return jnp.sum(contrib, axis=axes).astype(grad.dtype)


def prelu(data, slopes, inplace=False, sharedMaps=False):
    result = _preluCore(data.jax, slopes.jax, sharedMaps)

    if inplace:
        data._write(result)
        return data

    return GPUArray(result)


def preluBackwardData(grad, slopes, indata, sharedMaps=False):
    return GPUArray(_preluBackwardDataCore(grad.jax, slopes.jax, indata.jax, sharedMaps))


def preluBackwardParams(indata, outgrad, sharedMaps=False):
    return GPUArray(_preluBackwardParamsCore(indata.jax, outgrad.jax, sharedMaps))
