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


# measured per-signature algo choices, keyed (batch, heads, seq, hdim, causal,
# dtype) - the attention arm of the conv/GEMM measured-dispatch family
# (ops.conv._algoChoice; the cuDNN-algo-search role of
# /root/reference/Cuda/GPUBackend.py:371).  Populated by measureAttnChoice
# (Module.optimizeForShape / benchmarks.attnspeed); consulted by resolveAlgo.
_attnChoice = {}


def _signature(batch, nheads, seq, hdim, causal, dtype):
    return (batch, nheads, seq, hdim, bool(causal), str(np.dtype(dtype)))


def resolveAlgo(batch, nheads, seq, hdim, causal, dtype):
    """Concrete kernel for this signature under ``Config.attentionAlgo``.

    Explicit "xla"/"flash" force that path.  "auto" consults the measured
    table first; an unmeasured signature falls back to the structural prior:
    the flash kernel wins 1.50-2.17x over XLA at every measured long-sequence
    config (seq 2048/4096 fwd+bwd, 2026-08-19, docs/kernels.md), while short
    sequences fit XLA's fused softmax without blocking - so flash for
    seq >= 1024 bf16 on a real TPU, XLA otherwise.
    """
    from puzzlelib_tpu import config as Config

    algo = getattr(Config, "attentionAlgo", "auto")
    if algo != "auto":
        return algo

    if jax.devices()[0].platform == "cpu":
        return "xla"         # the Pallas kernel needs Mosaic (interpret-only on CPU)

    if np.dtype(dtype) != np.dtype(jnp.bfloat16):
        return "xla"

    choice = _attnChoice.get(_signature(batch, nheads, seq, hdim, causal, dtype))
    if choice is not None:
        return choice

    return "flash" if seq >= 1024 else "xla"


def measureAttnChoice(batch, nheads, seq, hdim, causal=False, dtype=jnp.bfloat16,
                      reps=(4, 12), k=3):
    """Race flash vs XLA on the full training step (grad wrt q/k/v) for this
    signature with the equal-harness methodology (array-delta perturbations,
    rep-differenced min-of-k chains; benchmarks.timing) and persist the
    winner; ties go to XLA.  Returns {"flash": secs, "xla": secs} or None
    when the race cannot run (CPU platform / non-bf16)."""
    from puzzlelib_tpu.backend.device import ensureInit
    ensureInit()

    if jax.devices()[0].platform == "cpu" or np.dtype(dtype) != np.dtype(jnp.bfloat16):
        return None

    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime
    from puzzlelib_tpu.ops.pallas.flash import flashAttention

    keys = jax.random.split(jax.random.key(3), 3)
    q, k_, v = [(jax.random.normal(kk, (batch, nheads, seq, hdim), jnp.float32) * 0.5
                 ).astype(dtype) for kk in keys]

    rows = min(8, nheads)
    deltas = deltaBank((rows, ) + q.shape[2:], q.dtype, max(reps), seed=5)

    def makeStep(core):
        grad = jax.grad(lambda qq, kk, vv:
                        jnp.sum(core(qq, kk, vv).astype(jnp.float32) ** 2),
                        argnums=(0, 1, 2))

        def step(i, q, k, v, d):
            dq, dk, dv = grad(q.at[:, :rows].add(d[i]), k, v)
            return (jnp.max(dq.astype(jnp.float32))
                    + jnp.max(dk.astype(jnp.float32))
                    + jnp.max(dv.astype(jnp.float32))).reshape(1)

        return step

    times = {}
    for name, core in (("xla", lambda qq, kk, vv: attention(qq, kk, vv, causal=causal)),
                       ("flash", lambda qq, kk, vv: flashAttention(qq, kk, vv, causal))):
        try:
            times[name] = marginalTime(makeStep(core), (q, k_, v, deltas),
                                       reps1=reps[0], reps2=reps[1], k=k)
        except Exception:
            pass

    if "xla" not in times or "flash" not in times:
        return times or None

    choice = "flash" if times["flash"] < times["xla"] * 0.97 else "xla"
    _attnChoice[_signature(batch, nheads, seq, hdim, causal, dtype)] = choice

    # dispatch is read at trace time; drop traces that pinned the old choice
    for fn in (mhaForward, mhaBackward):
        try:
            fn.clear_cache()
        except Exception:
            pass

    return times


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
