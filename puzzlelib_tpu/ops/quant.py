"""int8 quantized inference primitives.

The TPU-native answer to the reference's TensorRT int8 mode
(/root/reference/Converter/TensorRT/BuildRTEngine.py:181-193 +
DataCalibrator.py): activations are quantized symmetrically with a
calibrated per-tensor scale, weights per-output-channel, and the integer
dot/conv runs with ``preferred_element_type=int32`` so XLA lowers it onto
the MXU's native int8 path. Dequantisation and bias-add stay in f32 and
fuse into the surrounding computation.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def quantizeWeight(w, axis):
    """Per-output-channel symmetric int8 quantisation of a weight array.

    Returns (wq int8, scale f32 broadcastable against w along ``axis``).
    """
    w = np.asarray(w, dtype=np.float32)

    reduceAxes = tuple(i for i in range(w.ndim) if i != axis)
    absmax = np.abs(w).max(axis=reduceAxes, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)

    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale


def _quantizeAct(x, scale):
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0)
    return q.astype(jnp.int8)


@partial(jax.jit, static_argnames=("transpose", ))
def quantLinear(x, wq, wscale, xscale, b, transpose=False):
    """y = dequant(int8(x) @ int8(w)) + b; wscale is (1, out) or (out, 1)."""
    xq = _quantizeAct(x, xscale)

    acc = lax.dot_general(
        xq, wq,
        dimension_numbers=(((1, ), (1 if transpose else 0, )), ((), ())),
        preferred_element_type=jnp.int32,
    )

    outscale = wscale.reshape(1, -1) * xscale
    out = acc.astype(jnp.float32) * outscale

    if b is not None:
        out = out + b.astype(jnp.float32)[None, :]

    return out


@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups"))
def quantConvNd(x, wq, wscale, xscale, b, stride, pad, dilation, groups):
    """int8 conv: wscale has shape (outmaps, 1, 1, ...) matching w's O axis."""
    nd = x.ndim - 2
    spatial = "DHW"[3 - nd:]

    xq = _quantizeAct(x, xscale)

    acc = lax.conv_general_dilated(
        xq, wq,
        window_strides=stride,
        padding=[(p, p) for p in pad],
        rhs_dilation=dilation,
        dimension_numbers=("NC" + spatial, "OI" + spatial, "NC" + spatial),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )

    outscale = wscale.reshape((1, -1) + (1, ) * nd) * xscale
    out = acc.astype(jnp.float32) * outscale

    if b is not None:
        out = out + b.astype(jnp.float32).reshape((1, -1) + (1, ) * nd)

    return out
