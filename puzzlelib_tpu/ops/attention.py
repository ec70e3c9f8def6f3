"""Scaled-dot-product attention primitives.

The reference has no attention modules; this is a TPU-native extension (the
transformer serving/training path). The XLA implementation below is the
reference semantics + training backward (VJP); ``ops/pallas/flash.py`` holds
the hand-tiled online-softmax kernel used on the forward inference path when
``Config.attentionAlgo == "flash"``.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("causal", ))
def attention(q, k, v, causal=False):
    """q/k/v (batch, heads, seq, dim) -> (batch, heads, seq, dim), f32 accum."""
    dim = q.shape[-1]
    scale = 1.0 / np.sqrt(dim)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale

    if causal:
        seqQ, seqK = q.shape[2], k.shape[2]
        mask = jnp.tril(jnp.ones((seqQ, seqK), bool), k=seqK - seqQ)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@partial(jax.jit, static_argnames=("causal", ))
def attentionBackward(q, k, v, grad, causal=False):
    """VJP of :func:`attention` wrt (q, k, v)."""
    _, vjp = jax.vjp(lambda qq, kk, vv: attention(qq, kk, vv, causal=causal), q, k, v)
    return vjp(grad)


def _gateKeyed(jitted):
    # the disablePallas state must be part of the cache key (see
    # ops.conv._pallasGateKey); reuse that wrapper lazily to avoid an
    # import cycle at module load
    from puzzlelib_tpu.ops.conv import _pallasGateKey
    return _pallasGateKey(jitted)


@_gateKeyed
@partial(jax.jit, static_argnames=("nheads", "causal", "algo", "xlaOnly"))
def mhaForward(x, wq, wk, wv, wo, bq, bk, bv, bo, nheads, causal=False, algo="xla",
               xlaOnly=False):
    """Full multi-head attention block: (batch, seq, emb) -> (batch, seq, emb).

    Weights are (emb, emb); heads split the embedding dim. ``algo="flash"``
    routes the core through the Pallas online-softmax kernel.
    """
    batch, seq, emb = x.shape
    hdim = emb // nheads

    def proj(w, b):
        y = jnp.einsum("bse,ef->bsf", x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        if b is not None:
            y = y + b
        return y.reshape(batch, seq, nheads, hdim).transpose(0, 2, 1, 3)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)

    from puzzlelib_tpu.ops import conv as _opsconv

    if algo == "flash" and not _opsconv._pallasDisabled:
        from puzzlelib_tpu.ops.pallas.flash import flashAttention
        out = flashAttention(q, k, v, causal=causal)
    else:
        out = attention(q, k, v, causal=causal)

    out = out.transpose(0, 2, 1, 3).reshape(batch, seq, emb)

    y = jnp.einsum("bse,ef->bsf", out, wo, preferred_element_type=jnp.float32).astype(x.dtype)
    if bo is not None:
        y = y + bo

    return y


@partial(jax.jit, static_argnames=("nheads", "causal", "algo"))
def mhaBackward(x, wq, wk, wv, wo, bq, bk, bv, bo, grad, nheads, causal=False, algo="xla"):
    """VJP of the full MHA block wrt input and every weight/bias.

    ``algo="flash"`` differentiates through the Pallas kernel, whose
    custom VJP runs the blockwise flash backward."""
    hasB = bq is not None

    def fwd(xx, *params):
        if hasB:
            wq_, wk_, wv_, wo_, bq_, bk_, bv_, bo_ = params
        else:
            wq_, wk_, wv_, wo_ = params
            bq_ = bk_ = bv_ = bo_ = None

        return mhaForward(xx, wq_, wk_, wv_, wo_, bq_, bk_, bv_, bo_, nheads, causal, algo)

    params = (wq, wk, wv, wo) + ((bq, bk, bv, bo) if hasB else ())
    _, vjp = jax.vjp(fwd, x, *params)
    return vjp(grad)
