"""Flash attention: online-softmax tiled kernels for the MXU.

Forward grid is (batch*heads, seqQ/bq); each program streams K/V blocks with
running (max, sum) statistics so the (seqQ, seqK) score matrix never
materializes in HBM — the standard flash schedule expressed in Pallas.

Training is supported through ``jax.custom_vjp``: the forward also emits the
per-row logsumexp, and the backward recomputes probabilities blockwise in two
kernels (dQ over Q blocks; dK/dV over K blocks), FlashAttention-2 style, so
the backward is O(seq) memory as well.  f32 accumulation, any input dtype.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG_INF = -1e30


def _flashKernel(qRef, kRef, vRef, oRef, lseRef, *, blockK, scale, causal, bq, offset):
    # qRef (bq, d); kRef/vRef (seqK, d); oRef (bq, d); lseRef (1, bq)
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
            s = jnp.where(qPos + offset >= kPos, s, NEG_INF)

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
    lseRef[...] = (m + jnp.log(l))[None, :]


def _dqKernel(qRef, kRef, vRef, doRef, lseRef, deltaRef, dqRef, *,
              blockK, scale, causal, bq, offset):
    # qRef/doRef/dqRef (bq, d); kRef/vRef (seqK, d); lseRef/deltaRef (1, bq)
    q = qRef[...].astype(jnp.float32)
    do = doRef[...].astype(jnp.float32)
    lse = lseRef[0, :]
    delta = deltaRef[0, :]

    seqK, d = kRef.shape
    nk = seqK // blockK
    iq = pl.program_id(1)

    def body(ik, acc):
        k = kRef[pl.dslice(ik * blockK, blockK), :].astype(jnp.float32)
        v = vRef[pl.dslice(ik * blockK, blockK), :].astype(jnp.float32)

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) * scale

        if causal:
            qPos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, blockK), 0)
            kPos = ik * blockK + jax.lax.broadcasted_iota(jnp.int32, (bq, blockK), 1)
            s = jnp.where(qPos + offset >= kPos, s, NEG_INF)

        p = jnp.exp(s - lse[:, None])                            # (bq, blockK)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT)
        ds = p * (dp - delta[:, None])

        return acc + jnp.dot(ds, k, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((q.shape[0], d), jnp.float32))
    dqRef[...] = (acc * scale).astype(dqRef.dtype)


def _dkvKernel(kRef, vRef, qRef, doRef, lseRef, deltaRef, dkRef, dvRef, *,
               blockQ, scale, causal, bk, offset):
    # kRef/vRef/dkRef/dvRef (bk, d); qRef/doRef (seqQ, d); lseRef/deltaRef (1, seqQ)
    k = kRef[...].astype(jnp.float32)
    v = vRef[...].astype(jnp.float32)

    seqQ, d = qRef.shape
    nq = seqQ // blockQ
    ik = pl.program_id(1)

    def body(iq, carry):
        dk, dv = carry

        q = qRef[pl.dslice(iq * blockQ, blockQ), :].astype(jnp.float32)
        do = doRef[pl.dslice(iq * blockQ, blockQ), :].astype(jnp.float32)
        lse = lseRef[0, pl.dslice(iq * blockQ, blockQ)]
        delta = deltaRef[0, pl.dslice(iq * blockQ, blockQ)]

        sT = jnp.dot(k, q.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.DEFAULT) * scale  # (bk, blockQ)

        if causal:
            kPos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, blockQ), 0)
            qPos = iq * blockQ + jax.lax.broadcasted_iota(jnp.int32, (bk, blockQ), 1)
            sT = jnp.where(qPos + offset >= kPos, sT, NEG_INF)

        pT = jnp.exp(sT - lse[None, :])                          # (bk, blockQ)

        dvNew = dv + jnp.dot(pT, do, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)

        dpT = jnp.dot(v, do.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)       # (bk, blockQ)
        dsT = pT * (dpT - delta[None, :])

        dkNew = dk + jnp.dot(dsT, q, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)

        return dkNew, dvNew

    zero = jnp.zeros((k.shape[0], d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (zero, zero))

    dkRef[...] = (dk * scale).astype(dkRef.dtype)
    dvRef[...] = dv.astype(dvRef.dtype)


def _snapBlocks(blockQ, blockK, seqQ, seqK):
    """Snap requested block sizes to sequence divisors."""
    bq = next(b for b in range(min(blockQ, seqQ), 0, -1) if seqQ % b == 0)
    bk = next(b for b in range(min(blockK, seqK), 0, -1) if seqK % b == 0)
    return bq, bk


@functools.partial(jax.jit, static_argnames=("causal", "blockQ", "blockK", "interpret"))
def _flashForward(q, k, v, causal, blockQ, blockK, interpret):
    batch, heads, seqQ, d = q.shape
    seqK = k.shape[2]
    blockQ, blockK = _snapBlocks(blockQ, blockK, seqQ, seqK)

    qr = q.reshape(batch * heads, seqQ, d)
    kr = k.reshape(batch * heads, seqK, d)
    vr = v.reshape(batch * heads, seqK, d)

    grid = (batch * heads, seqQ // blockQ)

    out, lse = pl.pallas_call(
        functools.partial(
            _flashKernel, blockK=blockK, scale=1.0 / np.sqrt(d), causal=causal,
            bq=blockQ, offset=seqK - seqQ
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blockQ, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((None, seqK, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((None, seqK, d), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, blockQ, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((None, 1, blockQ), lambda bh, iq: (bh, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch * heads, seqQ, d), q.dtype),
            jax.ShapeDtypeStruct((batch * heads, 1, seqQ), jnp.float32),
        ],
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

    return out.reshape(batch, heads, seqQ, d), lse


@functools.partial(jax.jit, static_argnames=("causal", "blockQ", "blockK", "interpret"))
def _flashBackward(q, k, v, out, lse, do, causal, blockQ, blockK, interpret):
    batch, heads, seqQ, d = q.shape
    seqK = k.shape[2]
    blockQ, blockK = _snapBlocks(blockQ, blockK, seqQ, seqK)

    bh = batch * heads
    qr, dor = q.reshape(bh, seqQ, d), do.reshape(bh, seqQ, d)
    kr, vr = k.reshape(bh, seqK, d), v.reshape(bh, seqK, d)

    # delta_i = rowsum(dO * O): cheap elementwise reduction, no kernel needed
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(bh, 1, seqQ)

    scale = 1.0 / np.sqrt(d)
    common = dict(
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )

    dq = pl.pallas_call(
        functools.partial(_dqKernel, blockK=blockK, scale=scale, causal=causal,
                          bq=blockQ, offset=seqK - seqQ),
        grid=(bh, seqQ // blockQ),
        in_specs=[
            pl.BlockSpec((None, blockQ, d), lambda b, iq: (b, iq, 0)),
            pl.BlockSpec((None, seqK, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((None, seqK, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((None, blockQ, d), lambda b, iq: (b, iq, 0)),
            pl.BlockSpec((None, 1, blockQ), lambda b, iq: (b, 0, iq)),
            pl.BlockSpec((None, 1, blockQ), lambda b, iq: (b, 0, iq)),
        ],
        out_specs=pl.BlockSpec((None, blockQ, d), lambda b, iq: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, seqQ, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * seqQ * seqK * d,
            bytes_accessed=(2 * qr.size + kr.size + vr.size) * q.dtype.itemsize,
            transcendentals=bh * seqQ * seqK,
        ),
        **common,
    )(qr, kr, vr, dor, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkvKernel, blockQ=blockQ, scale=scale, causal=causal,
                          bk=blockK, offset=seqK - seqQ),
        grid=(bh, seqK // blockK),
        in_specs=[
            pl.BlockSpec((None, blockK, d), lambda b, ik: (b, ik, 0)),
            pl.BlockSpec((None, blockK, d), lambda b, ik: (b, ik, 0)),
            pl.BlockSpec((None, seqQ, d), lambda b, ik: (b, 0, 0)),
            pl.BlockSpec((None, seqQ, d), lambda b, ik: (b, 0, 0)),
            pl.BlockSpec((None, 1, seqQ), lambda b, ik: (b, 0, 0)),
            pl.BlockSpec((None, 1, seqQ), lambda b, ik: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, blockK, d), lambda b, ik: (b, ik, 0)),
            pl.BlockSpec((None, blockK, d), lambda b, ik: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, seqK, d), k.dtype),
            jax.ShapeDtypeStruct((bh, seqK, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * seqQ * seqK * d,
            bytes_accessed=(2 * qr.size + 2 * kr.size + vr.size) * q.dtype.itemsize,
            transcendentals=bh * seqQ * seqK,
        ),
        **common,
    )(kr, vr, qr, dor, lse, delta)

    shapeQ = (batch, heads, seqQ, d)
    shapeK = (batch, heads, seqK, d)
    return dq.reshape(shapeQ), dk.reshape(shapeK), dv.reshape(shapeK)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flashAttention(q, k, v, causal=False, blockQ=256, blockK=256, interpret=False):
    """q/k/v (batch, heads, seq, dim) -> (batch, heads, seq, dim).

    Differentiable: the VJP runs the Pallas flash backward (blockwise
    recompute from the forward's logsumexp), so ``attentionAlgo="flash"``
    holds during training.
    """
    out, _ = _flashForward(q, k, v, causal, blockQ, blockK, interpret)
    return out


def _flashFwdRule(q, k, v, causal, blockQ, blockK, interpret):
    out, lse = _flashForward(q, k, v, causal, blockQ, blockK, interpret)
    return out, (q, k, v, out, lse)


def _flashBwdRule(causal, blockQ, blockK, interpret, res, do):
    q, k, v, out, lse = res
    return _flashBackward(q, k, v, out, lse, do, causal, blockQ, blockK, interpret)


flashAttention.defvjp(_flashFwdRule, _flashBwdRule)
