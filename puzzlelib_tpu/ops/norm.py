"""Normalization primitives: batch norm, instance norm, LRN (map / cross-map).

Contracts follow the cuDNN bindings the reference dispatches to
(/root/reference/Cuda/Source/Libs/CuDnnNorm.c):

  * batchNorm  - "spatial" mode reduces over (N, spatial); "perActivation" over
    N only.  Training saves (mean, invstd) for backward; running stats update
    as running = (1-factor)*running + factor*batchstat, with the *unbiased*
    variance entering the running buffer (cuDNN semantics).
  * instanceNorm2d - batchnorm reshaped to (1, N*C, H, W), as the reference
    builds it (/root/reference/Cuda/GPUBackend.py:381).
  * LRN cross-map / map with the cuDNN normalization formula
    out = x / (K + alpha/N * sum(x^2))^beta (sum over adjacent channels /
    spatial window).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _bnAxes(ndim, mode):
    if mode == "spatial":
        return (0, ) + tuple(range(2, ndim))

    return (0, )


@partial(jax.jit, static_argnames=("mode", ))
def batchNormTrain(x, scale, bias, runMean, runVar, epsilon, factor, mode="spatial"):
    axes = _bnAxes(x.ndim, mode)
    n = 1
    for a in axes:
        n *= x.shape[a]

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(xf * xf, axis=axes) - mean * mean
    invstd = lax.rsqrt(var + jnp.asarray(epsilon, jnp.float32))

    shape = tuple(1 if i in axes else x.shape[i] for i in range(x.ndim))
    xhat = (xf - mean.reshape(shape)) * invstd.reshape(shape)
    out = xhat * scale.astype(jnp.float32).reshape(shape) + bias.astype(jnp.float32).reshape(shape)

    unbiased = var * (n / max(n - 1, 1))
    f = jnp.asarray(factor, jnp.float32)

    newRunMean = (1 - f) * runMean.astype(jnp.float32).ravel() + f * mean
    newRunVar = (1 - f) * runVar.astype(jnp.float32).ravel() + f * unbiased

    return (
        out.astype(x.dtype),
        mean.astype(x.dtype), invstd.astype(x.dtype),
        newRunMean.reshape(runMean.shape).astype(runMean.dtype),
        newRunVar.reshape(runVar.shape).astype(runVar.dtype),
    )


@partial(jax.jit, static_argnames=("mode", ))
def batchNormTest(x, scale, bias, runMean, runVar, epsilon, mode="spatial"):
    axes = _bnAxes(x.ndim, mode)
    shape = tuple(1 if i in axes else x.shape[i] for i in range(x.ndim))

    xf = x.astype(jnp.float32)
    invstd = lax.rsqrt(runVar.astype(jnp.float32).reshape(shape) + jnp.asarray(epsilon, jnp.float32))

    out = (xf - runMean.astype(jnp.float32).reshape(shape)) * invstd \
        * scale.astype(jnp.float32).reshape(shape) + bias.astype(jnp.float32).reshape(shape)

    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("mode", ))
def batchNormBackward(grad, x, scale, savemean, saveinvvar, epsilon, mode="spatial"):
    axes = _bnAxes(x.ndim, mode)
    n = 1
    for a in axes:
        n *= x.shape[a]

    shape = tuple(1 if i in axes else x.shape[i] for i in range(x.ndim))

    gf = grad.astype(jnp.float32)
    xf = x.astype(jnp.float32)

    mean = savemean.astype(jnp.float32).reshape(shape)
    invstd = saveinvvar.astype(jnp.float32).reshape(shape)

    xhat = (xf - mean) * invstd

    dbias = jnp.sum(gf, axis=axes)
    dscale = jnp.sum(gf * xhat, axis=axes)

    sf = scale.astype(jnp.float32).reshape(shape)
    dx = sf * invstd / n * (n * gf - dbias.reshape(shape) - xhat * dscale.reshape(shape))

    return (
        dx.astype(x.dtype),
        dscale.reshape(savemean.shape).astype(scale.dtype),
        dbias.reshape(savemean.shape).astype(scale.dtype),
    )


# -- instance norm -----------------------------------------------------------

@jax.jit
def instanceNorm2d(x, scale, bias, epsilon):
    n, c = x.shape[:2]
    xr = x.reshape((1, n * c) + x.shape[2:])

    extscale = jnp.tile(scale.ravel(), n)
    extbias = jnp.tile(bias.ravel(), n)

    out, mean, invstd, _, _ = batchNormTrain(
        xr, extscale, extbias, jnp.zeros_like(extscale), jnp.zeros_like(extscale), epsilon, 0.0, mode="spatial"
    )

    return out.reshape(x.shape), mean, invstd, extscale


@partial(jax.jit, static_argnames=("affine", ))
def instanceNorm2dBackward(grad, x, extscale, savemean, saveinvvar, epsilon, affine=True):
    n, c = x.shape[:2]
    gr = grad.reshape((1, n * c) + grad.shape[2:])
    xr = x.reshape((1, n * c) + x.shape[2:])

    dx, dscale, dbias = batchNormBackward(gr, xr, extscale, savemean, saveinvvar, epsilon, mode="spatial")
    dx = dx.reshape(x.shape)

    if not affine:
        return dx

    return dx, jnp.sum(dscale.reshape(n, c), axis=0), jnp.sum(dbias.reshape(n, c), axis=0)


# -- LRN ---------------------------------------------------------------------

def _crossMapSum(sq, N):
    half = N // 2
    padded = jnp.pad(sq, ((0, 0), (half, N - 1 - half)) + ((0, 0), ) * (sq.ndim - 2))

    dims = (1, N) + (1, ) * (sq.ndim - 2)
    return lax.reduce_window(padded, np.zeros((), sq.dtype), lax.add, dims, (1, ) * sq.ndim,
                             ((0, 0), ) * sq.ndim)


def _crossMapLRNCore(x, N, alpha, beta, K):
    xf = x.astype(jnp.float32)
    s = _crossMapSum(xf * xf, N)
    denom = (K + alpha / N * s) ** beta
    return (xf / denom).astype(x.dtype)


@partial(jax.jit, static_argnames=("N", ))
def crossMapLRN(x, N, alpha, beta, K):
    return _crossMapLRNCore(x, N, alpha, beta, K)


@partial(jax.jit, static_argnames=("N", ))
def crossMapLRNBackward(x, grad, N, alpha, beta, K):
    _, vjp = jax.vjp(lambda xx: _crossMapLRNCore(xx, N, alpha, beta, K), x)
    return vjp(grad)[0]


def _mapLRNCore(x, N, alpha, beta, K):
    # within-channel (spatial) local response normalization over an N x N window
    xf = x.astype(jnp.float32)
    half = N // 2

    pads = ((0, 0), (0, 0)) + ((half, N - 1 - half), ) * (x.ndim - 2)
    padded = jnp.pad(xf * xf, pads)

    dims = (1, 1) + (N, ) * (x.ndim - 2)
    s = lax.reduce_window(padded, np.float32(0), lax.add, dims, (1, ) * x.ndim,
                          ((0, 0), ) * x.ndim)

    denom = (K + alpha / (N ** (x.ndim - 2)) * s) ** beta
    return (xf / denom).astype(x.dtype)


@partial(jax.jit, static_argnames=("N", ))
def mapLRN(x, N, alpha, beta, K):
    return _mapLRNCore(x, N, alpha, beta, K)


@partial(jax.jit, static_argnames=("N", ))
def mapLRNBackward(x, grad, N, alpha, beta, K):
    _, vjp = jax.vjp(lambda xx: _mapLRNCore(xx, N, alpha, beta, K), x)
    return vjp(grad)[0]


# -- divisive normalization (LCN core) ---------------------------------------

def _divNormCore(x, means, N, alpha, beta, K):
    """Local contrast normalization: u = x - means, y = u / (K + alpha/n *
    window_sum(u^2))^beta over an N x N spatial window (cuDNN
    DivisiveNormalization with precomputed means; reference use:
    /root/reference/Modules/LCN.py)."""
    xf = x.astype(jnp.float32)
    u = xf - means.astype(jnp.float32)

    half = N // 2
    pads = ((0, 0), (0, 0)) + ((half, N - 1 - half), ) * (x.ndim - 2)
    padded = jnp.pad(u * u, pads)

    dims = (1, 1) + (N, ) * (x.ndim - 2)
    s = lax.reduce_window(padded, np.float32(0), lax.add, dims, (1, ) * x.ndim, ((0, 0), ) * x.ndim)

    denom = (K + alpha / (N ** (x.ndim - 2)) * s) ** beta
    return (u / denom).astype(x.dtype)


@partial(jax.jit, static_argnames=("N", ))
def divNorm(x, means, N, alpha, beta, K):
    return _divNormCore(x, means, N, alpha, beta, K)


@partial(jax.jit, static_argnames=("N", ))
def divNormBackward(x, means, grad, N, alpha, beta, K):
    _, vjp = jax.vjp(lambda xx, mm: _divNormCore(xx, mm, N, alpha, beta, K), x, means)
    return vjp(grad)
