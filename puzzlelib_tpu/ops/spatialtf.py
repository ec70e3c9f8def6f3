"""Spatial transformer: affine grid generation + bilinear sampling
(cuDNN SpatialTf semantics, /root/reference/Cuda/Source/Libs/CuDnnSpatialTf.c).

theta is (N, 2, 3) mapping normalized output coords (x, y, 1) in [-1, 1] to
normalized input coords; sampling is bilinear with zero padding outside, grid
corners aligned (cuDNN / torch align_corners=True convention).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _baseCoords(h, w):
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)

    X, Y = jnp.meshgrid(xs, ys)                      # (h, w)
    return jnp.stack([X, Y, jnp.ones_like(X)], axis=-1)  # (h, w, 3) as (x, y, 1)


def _affineGrid(theta, h, w):
    base = _baseCoords(h, w)
    return jnp.einsum("nij,hwj->nhwi", theta.astype(jnp.float32), base)  # (n, h, w, 2) = (x, y)


def _bilinearSample(x, grid):
    n, c, hin, win = x.shape
    xf = x.astype(jnp.float32)

    gx = (grid[..., 0] + 1.0) * 0.5 * (win - 1)      # (n, h, w)
    gy = (grid[..., 1] + 1.0) * 0.5 * (hin - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)

    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        validY = (yi >= 0) & (yi <= hin - 1)
        validX = (xi >= 0) & (xi <= win - 1)

        yc = jnp.clip(yi, 0, hin - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, win - 1).astype(jnp.int32)

        vals = xf[jnp.arange(n)[:, None, None], :, yc, xc]   # (n, h, w, c)
        return vals * (validY & validX)[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wxe = wx[..., None]
    wye = wy[..., None]

    out = (v00 * (1 - wxe) * (1 - wye) + v01 * wxe * (1 - wye)
           + v10 * (1 - wxe) * wye + v11 * wxe * wye)       # (n, h, w, c)

    return jnp.moveaxis(out, -1, 1).astype(x.dtype)


def _spatialTfCore(x, theta, outsize):
    grid = _affineGrid(theta, outsize[0], outsize[1])
    return _bilinearSample(x, grid), grid


@partial(jax.jit, static_argnames=("outshape", ))
def spatialTf(x, theta, outshape=None):
    outsize = x.shape[2:] if outshape is None else tuple(outshape[-2:])
    out, grid = _spatialTfCore(x, theta, outsize)
    return out, grid


@partial(jax.jit, static_argnames=())
def spatialTfBackward(grad, x, grid):
    outsize = grad.shape[2:]

    _, vjpData = jax.vjp(lambda xx: _bilinearSample(xx, grid), x)
    dx = vjpData(grad)[0]

    _, vjpGrid = jax.vjp(lambda gg: _bilinearSample(x, gg), grid)
    dgrid = vjpGrid(grad)[0]                                 # (n, h, w, 2)

    base = _baseCoords(outsize[0], outsize[1])               # (h, w, 3)
    dtheta = jnp.einsum("nhwi,hwj->nij", dgrid, base)

    return dx, dtheta.astype(x.dtype)
