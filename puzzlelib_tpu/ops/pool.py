"""Pooling (max / avg, 1D-3D, NCHW) + max-pool-with-indices and unpool.

cuDNN pooling contract (/root/reference/Cuda/Source/Libs/CuDnnPool.c):
  * max           - padded cells are -inf, backward routes the gradient to the
                    argmax cell (one winner per window);
  * avgWithPad    - mean over the *full* window including padded cells;
  * avgNoPad      - mean over valid cells only.

Forward uses ``lax.reduce_window`` (VPU-friendly), backward is the VJP of the
forward so the select-and-scatter lowering matches cuDNN's routing.

MaxPool2D-with-indices (for MaxUnpool2D) mirrors the custom CUDA kernel at
/root/reference/Cuda/Kernels/Pool.py:117: indices are flat offsets within each
input map.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


MODE_MAX = "max"
MODE_AVG_WITH_PAD = "avgWithPad"
MODE_AVG_NO_PAD = "avgNoPad"


def _useChannelsLast(dtype):
    from puzzlelib_tpu.ops.conv import _useChannelsLast as ucl
    return ucl(dtype)


def _window(x, size, stride, pad):
    nd = x.ndim - 2
    dims = (1, 1) + tuple(size)
    strides = (1, 1) + tuple(stride)
    padding = ((0, 0), (0, 0)) + tuple((p, p) for p in pad)
    return dims, strides, padding, nd


def _poolCore(x, size, stride, pad, mode):
    dims, strides, padding, nd = _window(x, size, stride, pad)

    if mode == MODE_MAX:
        # jnp.issubdtype, not dtype.kind: ml_dtypes floats (bfloat16) report kind 'V'
        isFloat = jnp.issubdtype(x.dtype, jnp.floating)
        init = np.array(-np.inf if isFloat else np.iinfo(x.dtype).min, x.dtype)
        return lax.reduce_window(x, init, lax.max, dims, strides, padding)

    summed = lax.reduce_window(
        x.astype(jnp.float32), np.float32(0), lax.add, dims, strides, padding
    )

    if mode == MODE_AVG_WITH_PAD:
        count = float(np.prod(size))
        return (summed / count).astype(x.dtype)

    ones = jnp.ones(x.shape[2:], jnp.float32)[None, None]
    counts = lax.reduce_window(ones, np.float32(0), lax.add, dims, strides, padding)
    return (summed / counts).astype(x.dtype)


def _poolCoreNhwc(x, size, stride, pad, mode):
    """2d pooling over the middle axes of an NHWC tensor — the layout the
    sub-f32 conv path already runs in (ops.conv layout policy), so inside a
    fused step the conv→pool boundary transposes cancel instead of paying a
    ~10 ms NCHW↔NHWC relayout per 200 MB activation."""
    dims = (1, ) + tuple(size) + (1, )
    strides = (1, ) + tuple(stride) + (1, )
    padding = ((0, 0), ) + tuple((p, p) for p in pad) + ((0, 0), )

    if mode == MODE_MAX:
        isFloat = jnp.issubdtype(x.dtype, jnp.floating)
        init = np.array(-np.inf if isFloat else np.iinfo(x.dtype).min, x.dtype)
        return lax.reduce_window(x, init, lax.max, dims, strides, padding)

    summed = lax.reduce_window(
        x.astype(jnp.float32), np.float32(0), lax.add, dims, strides, padding
    )

    if mode == MODE_AVG_WITH_PAD:
        return (summed / float(np.prod(size))).astype(x.dtype)

    ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
    counts = lax.reduce_window(ones, np.float32(0), lax.add, dims, strides, padding)
    return (summed / counts).astype(x.dtype)


def _nhwcEligible(x, size):
    return x.ndim == 4 and len(size) == 2 and _useChannelsLast(x.dtype)


@partial(jax.jit, static_argnames=("size", "stride", "pad", "mode"))
def poolNd(x, size, stride, pad, mode):
    if _nhwcEligible(x, size):
        out = _poolCoreNhwc(jnp.transpose(x, (0, 2, 3, 1)), size, stride, pad, mode)
        return jnp.transpose(out, (0, 3, 1, 2))

    return _poolCore(x, size, stride, pad, mode)


@partial(jax.jit, static_argnames=("size", "stride", "pad", "mode"))
def poolNdBackward(grad, x, size, stride, pad, mode):
    # the backward is the VJP of the forward in BOTH layouts: a fused-block
    # ablation (tools/fusedblock_probe.py, 2026-08-19) measured the
    # select-and-scatter lowering at +550 us fwd+bwd for (32,64,112,112)
    # inside a traced step, while a reshape+cumsum "first-winner" rewrite ran
    # 6x slower (+3288 us) - the scatter only looks slow in eager dispatch
    if _nhwcEligible(x, size):
        xl = jnp.transpose(x, (0, 2, 3, 1))
        gl = jnp.transpose(grad, (0, 2, 3, 1))

        _, vjp = jax.vjp(lambda xx: _poolCoreNhwc(xx, size, stride, pad, mode), xl)
        return jnp.transpose(vjp(gl)[0], (0, 3, 1, 2))

    _, vjp = jax.vjp(lambda xx: _poolCore(xx, size, stride, pad, mode), x)
    return vjp(grad)[0]


# -- max pool with explicit indices (for MaxUnpool) --------------------------

@partial(jax.jit, static_argnames=("size", "stride", "pad"))
def maxpool2dWithIndex(x, size, stride, pad):
    """Max pool returning per-window argmax as flat offsets into each (h, w) map.
    Ties resolve to the first (lowest-offset) cell, as in the reference kernel."""
    n, c, h, w = x.shape
    kh, kw = size
    sh, sw = stride
    ph, pw = pad

    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), constant_values=neg)

    patches = lax.conv_general_dilated_patches(
        xp, filter_shape=(kh, kw), window_strides=(sh, sw), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (n, c*kh*kw, outh, outw), feature dim ordered (c, kh, kw)

    outh, outw = patches.shape[2], patches.shape[3]
    patches = patches.reshape(n, c, kh * kw, outh, outw)

    off = jnp.argmax(patches, axis=2).astype(jnp.int32)           # offset within window
    out = jnp.max(patches, axis=2)

    ohArange = jnp.arange(outh, dtype=jnp.int32).reshape(1, 1, outh, 1)
    owArange = jnp.arange(outw, dtype=jnp.int32).reshape(1, 1, 1, outw)

    row = ohArange * sh + off // kw - ph
    col = owArange * sw + off % kw - pw
    idx = row * w + col

    return out, idx


@partial(jax.jit, static_argnames=("inshape", ))
def maxunpool2d(x, idx, inshape):
    n, c = x.shape[:2]
    h, w = inshape[2], inshape[3]

    flat = jnp.zeros((n, c, h * w), x.dtype)
    flat = flat.at[
        jnp.arange(n)[:, None, None], jnp.arange(c)[None, :, None], idx.reshape(n, c, -1)
    ].add(x.reshape(n, c, -1))

    return flat.reshape(n, c, h, w)


@partial(jax.jit, static_argnames=())
def maxunpool2dBackward(grad, idx):
    n, c = idx.shape[:2]
    gathered = jnp.take_along_axis(grad.reshape(n, c, -1), idx.reshape(n, c, -1), axis=2)
    return gathered.reshape(idx.shape)
