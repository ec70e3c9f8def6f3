"""Flash attention: online-softmax tiled kernel for the MXU.

Grid is (batch*heads, seqQ/bq); each program streams K/V blocks with running
(max, sum) statistics so the (seqQ, seqK) score matrix never materializes in
HBM — the standard flash schedule expressed in Pallas. f32 accumulation, any
input dtype.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG_INF = -1e30


def _flashKernel(qRef, kRef, vRef, oRef, *, blockK, scale, causal, bq):
    # qRef (bq, d); kRef/vRef (seqK, d); oRef (bq, d)
    q = qRef[...].astype(jnp.float32) * scale
    seqK, d = kRef.shape

    nk = seqK // blockK
    iq = pl.program_id(1)

    def body(ik, carry):
        acc, m, l = carry

        k = kRef[pl.dslice(ik * blockK, blockK), :].astype(jnp.float32)
        v = vRef[pl.dslice(ik * blockK, blockK), :].astype(jnp.float32)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)         # (bq, blockK)

        if causal:
            qPos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, blockK), 0)
            kPos = ik * blockK + jax.lax.broadcasted_iota(jnp.int32, (bq, blockK), 1)
            s = jnp.where(qPos >= kPos, s, NEG_INF)

        mNew = jnp.maximum(m, jnp.max(s, axis=1))
        p = jnp.exp(s - mNew[:, None])
        corr = jnp.exp(m - mNew)

        lNew = l * corr + jnp.sum(p, axis=1)
        accNew = acc * corr[:, None] + jnp.dot(p, v, preferred_element_type=jnp.float32,
                                               precision=jax.lax.Precision.DEFAULT)

        return accNew, mNew, lNew

    acc = jnp.zeros((q.shape[0], d), jnp.float32)
    m = jnp.full((q.shape[0], ), NEG_INF, jnp.float32)
    l = jnp.zeros((q.shape[0], ), jnp.float32)

    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc, m, l))

    oRef[...] = (acc / l[:, None]).astype(oRef.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "blockQ", "blockK", "interpret"))
def flashAttention(q, k, v, causal=False, blockQ=256, blockK=256, interpret=False):
    """q/k/v (batch, heads, seq, dim) -> (batch, heads, seq, dim).

    seqQ must divide by blockQ and seqK by blockK (the module layer pads).
    """
    batch, heads, seqQ, d = q.shape
    seqK = k.shape[2]

    # snap block sizes to divisors so the grid covers the whole sequence
    blockQ = next(b for b in range(min(blockQ, seqQ), 0, -1) if seqQ % b == 0)
    blockK = next(b for b in range(min(blockK, seqK), 0, -1) if seqK % b == 0)

    qr = q.reshape(batch * heads, seqQ, d)
    kr = k.reshape(batch * heads, seqK, d)
    vr = v.reshape(batch * heads, seqK, d)

    grid = (batch * heads, seqQ // blockQ)

    out = pl.pallas_call(
        functools.partial(
            _flashKernel, blockK=blockK, scale=1.0 / np.sqrt(d), causal=causal, bq=blockQ
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blockQ, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((None, seqK, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((None, seqK, d), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, blockQ, d), lambda bh, iq: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * heads, seqQ, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * seqQ * seqK * d,
            bytes_accessed=(qr.size + kr.size + vr.size + batch * heads * seqQ * d) * q.dtype.itemsize,
            transcendentals=batch * heads * seqQ * seqK,
        ),
        interpret=interpret,
    )(qr, kr, vr)

    return out.reshape(batch, heads, seqQ, d)
