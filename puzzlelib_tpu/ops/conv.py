"""N-dimensional convolution / deconvolution in NCHW layout.

Replaces the cuDNN binding (/root/reference/Cuda/Source/Libs/CuDnn.c:1155-1220)
with ``lax.conv_general_dilated``: XLA lowers these onto the MXU directly, and
the explicit backward functions are expressed as VJPs of the forward so XLA can
DCE unused residual computation (conv-bwd-data never touches activations,
conv-bwd-filter never touches the filter).

Algo selection (``ConvFwdAlgo`` etc.) is retained as an API-level no-op: XLA
owns scheduling, and `optimizeForShape` maps to ahead-of-time compilation.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _dimNumbers(nd):
    spatial = "DHW"[3 - nd:]
    return ("NC" + spatial, "OI" + spatial, "NC" + spatial)


def _convCore(x, w, stride, pad, dilation, groups):
    nd = x.ndim - 2
    return lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(p, p) for p in pad],
        rhs_dilation=dilation,
        dimension_numbers=_dimNumbers(nd),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups", "hasBias"))
def convNd(x, w, b, stride, pad, dilation, groups, hasBias=False):
    out = _convCore(x, w, stride, pad, dilation, groups)

    if hasBias:
        out = out + b.reshape((1, b.size) + (1, ) * (x.ndim - 2)).astype(out.dtype)

    return out


def _convCoreF32(x, w, stride, pad, dilation, groups):
    """f32 conv core for VJP-based paths.

    The transpose rule of ``conv_general_dilated`` requires the cotangent and
    the carried operand to share a dtype; with ``preferred_element_type=f32``
    and fp16/bf16 params the cotangent is f32 while ``w`` is half — so the
    backward paths run through this all-f32 core and cast at the boundary.
    """
    nd = x.ndim - 2
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=stride,
        padding=[(p, p) for p in pad],
        rhs_dilation=dilation,
        dimension_numbers=_dimNumbers(nd),
        feature_group_count=groups,
    )


@partial(jax.jit, static_argnames=("xshape", "stride", "pad", "dilation", "groups"))
def convNdBackwardData(grad, w, xshape, stride, pad, dilation, groups):
    x0 = jnp.zeros(xshape, jnp.float32)
    _, vjp = jax.vjp(lambda xx: _convCoreF32(xx, w, stride, pad, dilation, groups), x0)
    return vjp(grad.astype(jnp.float32))[0].astype(grad.dtype)


@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups", "hasBias"))
def convNdBackwardParams(x, grad, wshape_w, stride, pad, dilation, groups, hasBias=False):
    _, vjp = jax.vjp(lambda ww: _convCoreF32(x, ww, stride, pad, dilation, groups), wshape_w)
    dw = vjp(grad.astype(jnp.float32))[0]

    db = None
    if hasBias:
        axes = (0, ) + tuple(range(2, grad.ndim))
        db = jnp.sum(grad.astype(jnp.float32), axis=axes).astype(grad.dtype)

    return dw, db


# -- deconvolution (transposed conv, cuDNN-style: fwd == conv bwd-data) ------

def _deconvCore(x, w, stride, pad, dilation, postpad, groups):
    """Transposed conv: x (N, inmaps, ...), w (inmaps, outmaps//groups, ...).

    cuDNN deconvolution == conv-backward-data of x through w, i.e. the VJP of
    the forward conv that maps (N, outmaps, outspatial) -> (N, inmaps, inspatial);
    out spatial = stride*(in-1) + dilation*(size-1) + 1 - 2*pad + postpad.
    """
    nd = x.ndim - 2
    size = w.shape[2:]

    outspatial = tuple(
        stride[i] * (x.shape[2 + i] - 1) + dilation[i] * (size[i] - 1) + 1 - 2 * pad[i] + postpad[i]
        for i in range(nd)
    )

    y0 = jnp.zeros((x.shape[0], w.shape[1] * groups) + outspatial, jnp.float32)
    _, vjp = jax.vjp(lambda yy: _convCoreF32(yy, w, stride, pad, dilation, groups), y0)
    return vjp(x.astype(jnp.float32))[0].astype(x.dtype)


@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "postpad", "groups", "hasBias"))
def deconvNd(x, w, b, stride, pad, dilation, postpad, groups, hasBias=False):
    out = _deconvCore(x, w, stride, pad, dilation, postpad, groups)

    if hasBias:
        out = out + b.reshape((1, b.size) + (1, ) * (x.ndim - 2)).astype(out.dtype)

    return out


@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups"))
def deconvNdBackwardData(grad, w, stride, pad, dilation, groups):
    # gradient of deconv wrt input == the plain forward conv of grad with w
    # (w is already OIHW for that direction: O=inmaps, I=outmaps//groups)
    return _convCore(grad, w, stride, pad, dilation, groups)


@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "postpad", "groups", "hasBias"))
def deconvNdBackwardParams(x, grad, w, stride, pad, dilation, postpad, groups, hasBias=False):
    _, vjp = jax.vjp(lambda ww: _deconvCore(x, ww, stride, pad, dilation, postpad, groups), w)
    dw = vjp(grad)[0]

    db = None
    if hasBias:
        axes = (0, ) + tuple(range(2, grad.ndim))
        db = jnp.sum(grad.astype(jnp.float32), axis=axes).astype(grad.dtype)

    return dw, db
