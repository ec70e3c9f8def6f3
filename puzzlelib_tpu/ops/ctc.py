"""Connectionist Temporal Classification loss.

TPU-native replacement for the reference CUDA kernels
(/root/reference/Cuda/Kernels/CTC.py: per-batch log-space alpha/beta kernels
with host-side label segmentation + radix-sort tiling).  Here the recursions
are two ``lax.scan``s over time, vectorized across the whole batch with padded
extended label sequences and masks - no per-sample kernels, no sorting.

Contract (matches ``hostCTCLoss`` at /root/reference/Cuda/Kernels/CTC.py:328):
  * data (T, B, V): raw scores (softmaxed internally unless ``normalized``);
  * labels: concatenation of per-sample label sequences; lengths (B, );
    datalen (B, ) per-sample time lengths;
  * returns (error = sum of per-sample NLL, grad = descent direction,
    zero for t >= datalen[b]).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


_NEG = -1e30


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


@partial(jax.jit, static_argnames=("blank", ))
def _ctcCore(p, extLabels, svalid, datalen, blank):
    """p (T,B,V) probabilities; extLabels (B,S) int32; svalid (B,) = 2*len+1."""
    T, B, V = p.shape
    S = extLabels.shape[1]

    logp = jnp.log(jnp.maximum(p, 1e-38))                    # (T,B,V)
    lpExt = jnp.take_along_axis(
        logp, jnp.broadcast_to(extLabels[None], (T, B, S)), axis=2
    )                                                        # (T,B,S)

    sIdx = jnp.arange(S)[None, :]                            # (1,S)
    sMask = sIdx < svalid[:, None]                           # (B,S) valid slots

    ext2 = jnp.concatenate([jnp.full((B, 2), -1, extLabels.dtype), extLabels[:, :-2]], axis=1)
    allow2 = (sIdx > 1) & (extLabels != blank) & (extLabels != ext2)

    # -- alpha ---------------------------------------------------------------

    alpha0 = jnp.where((sIdx == 0) | ((sIdx == 1) & (svalid[:, None] > 1)), lpExt[0], _NEG)
    alpha0 = jnp.where(sMask, alpha0, _NEG)

    def alphaStep(alphaPrev, lpT):
        shift1 = jnp.concatenate([jnp.full((B, 1), _NEG), alphaPrev[:, :-1]], axis=1)
        shift2 = jnp.concatenate([jnp.full((B, 2), _NEG), alphaPrev[:, :-2]], axis=1)

        prev = _logaddexp(alphaPrev, shift1)
        prev = jnp.where(allow2, _logaddexp(prev, shift2), prev)

        alphaT = jnp.where(sMask, prev + lpT, _NEG)
        return alphaT, alphaT

    _, alphaRest = jax.lax.scan(alphaStep, alpha0, lpExt[1:])
    alphas = jnp.concatenate([alpha0[None], alphaRest], axis=0)     # (T,B,S)

    lastT = jnp.clip(datalen - 1, 0, T - 1)                          # (B,)
    alphaLast = jnp.take_along_axis(
        alphas, jnp.broadcast_to(lastT[None, :, None], (1, B, S)), axis=0
    )[0]                                                             # (B,S)

    aEnd1 = jnp.take_along_axis(alphaLast, jnp.clip(svalid - 1, 0, S - 1)[:, None], axis=1)[:, 0]
    aEnd2 = jnp.take_along_axis(alphaLast, jnp.clip(svalid - 2, 0, S - 1)[:, None], axis=1)[:, 0]

    loglike = _logaddexp(aEnd1, aEnd2)
    nll = -loglike                                                   # (B,)

    # -- beta (reverse) ------------------------------------------------------

    extFwd2 = jnp.concatenate([extLabels[:, 2:], jnp.full((B, 2), -1, extLabels.dtype)], axis=1)
    allowFwd2 = (sIdx < svalid[:, None] - 2) & (extLabels != blank) & (extLabels != extFwd2)

    tIdx = jnp.arange(T)

    def betaStep(betaNext, xs):
        t, lpT = xs

        shift1 = jnp.concatenate([betaNext[:, 1:], jnp.full((B, 1), _NEG)], axis=1)
        shift2 = jnp.concatenate([betaNext[:, 2:], jnp.full((B, 2), _NEG)], axis=1)

        nxt = _logaddexp(betaNext, shift1)
        nxt = jnp.where(allowFwd2, _logaddexp(nxt, shift2), nxt)

        recur = nxt + lpT

        # at t == datalen-1, (re)initialize: beta = lp on the last two slots
        init = jnp.where((sIdx == svalid[:, None] - 1) | (sIdx == svalid[:, None] - 2), lpT, _NEG)

        isLast = (t == (datalen - 1))[:, None]
        beyond = (t > (datalen - 1))[:, None]

        betaT = jnp.where(isLast, init, jnp.where(beyond, _NEG, recur))
        betaT = jnp.where(sMask, betaT, _NEG)

        return betaT, betaT

    _, betasRev = jax.lax.scan(betaStep, jnp.full((B, S), _NEG), (tIdx[::-1], lpExt[::-1]))
    betas = betasRev[::-1]                                           # (T,B,S)

    # -- gradient ------------------------------------------------------------

    gamma = jnp.exp(jnp.clip(alphas + betas + nll[None, :, None], _NEG, 30.0))
    gamma = jnp.where(sMask[None], gamma, 0.0)

    tt = jnp.broadcast_to(tIdx[:, None, None], (T, B, S))
    bb = jnp.broadcast_to(jnp.arange(B)[None, :, None], (T, B, S))
    vv = jnp.broadcast_to(extLabels[None], (T, B, S))

    gsum = jnp.zeros((T, B, V)).at[tt, bb, vv].add(gamma)

    grad = p - gsum / jnp.maximum(p, 1e-38)
    grad = jnp.where(tIdx[:, None, None] < datalen[None, :, None], grad, 0.0)

    return jnp.sum(nll), (-grad).astype(p.dtype)


def ctcLoss(data, datalen, labels, lengths, blank, normalized=False):
    T, B, V = data.shape

    if not normalized:
        data = jax.nn.softmax(data.astype(jnp.float32), axis=2)
    else:
        data = data.astype(jnp.float32)

    lengthsHost = np.asarray(lengths)
    labelsHost = np.asarray(labels)

    maxL = int(lengthsHost.max()) if lengthsHost.size else 1
    S = 2 * maxL + 1

    ext = np.full((B, S), blank, dtype=np.int32)
    offset = 0
    for b in range(B):
        L = int(lengthsHost[b])
        ext[b, 1:2 * L + 1:2] = labelsHost[offset:offset + L]
        offset += L

    svalid = (2 * lengthsHost + 1).astype(np.int32)

    err, grad = _ctcCore(data, jnp.asarray(ext), jnp.asarray(svalid), jnp.asarray(np.asarray(datalen)), int(blank))
    return err, grad


def hostCTCLoss(data, datalen, labels, lengths, blank):
    """Independent pure-numpy CTC oracle (per-sample log-space
    forward/backward in float64) — shares no code with the jitted ``ctcLoss``
    above, so it can serve as its correctness reference.

    Returns (sum of per-sample NLL, dNLL/dlogits with zeros past datalen,
    None) — the reference's ``hostCTCLoss`` output contract
    (/root/reference/Cuda/Kernels/CTC.py:328)."""
    from puzzlelib_tpu.tensor import GPUArray

    toNp = lambda a: a.get() if isinstance(a, GPUArray) else np.asarray(a)

    x = toNp(data).astype(np.float64)
    datalen, labels, lengths = toNp(datalen), toNp(labels), toNp(lengths)

    ex = np.exp(x - x.max(axis=2, keepdims=True))
    p = ex / ex.sum(axis=2, keepdims=True)                     # (T, B, V)

    T, B, V = p.shape
    NEG = -np.inf

    grad = np.zeros((T, B, V), np.float32)
    nllTotal = 0.0
    offset = 0

    for b in range(B):
        L, Tb = int(lengths[b]), int(datalen[b])

        ext = np.full(2 * L + 1, blank, np.int64)
        ext[1::2] = labels[offset:offset + L]
        offset += L

        S = ext.size
        lp = np.log(np.maximum(p[:Tb, b], 1e-300))[:, ext]     # (Tb, S)

        # skip-transition masks: a non-blank may skip the preceding blank
        # unless it repeats the previous label
        skipIn = np.zeros(S, bool)
        skipIn[2:] = (ext[2:] != blank) & (ext[2:] != ext[:-2])

        skipOut = np.zeros(S, bool)
        skipOut[:-2] = skipIn[2:]

        alpha = np.full((Tb, S), NEG)
        alpha[0, :min(2, S)] = lp[0, :min(2, S)]

        for t in range(1, Tb):
            prev = alpha[t - 1]
            reach = np.logaddexp(prev, np.concatenate(([NEG], prev[:-1])))
            skip = np.concatenate(([NEG, NEG], prev[:-2]))
            alpha[t] = np.where(skipIn, np.logaddexp(reach, skip), reach) + lp[t]

        loglike = alpha[Tb - 1, S - 1] if S < 2 else np.logaddexp(alpha[Tb - 1, S - 1], alpha[Tb - 1, S - 2])
        nll = -loglike
        nllTotal += nll

        beta = np.full((Tb, S), NEG)
        beta[Tb - 1, max(0, S - 2):] = lp[Tb - 1, max(0, S - 2):]

        for t in range(Tb - 2, -1, -1):
            nxt = beta[t + 1]
            reach = np.logaddexp(nxt, np.concatenate((nxt[1:], [NEG])))
            skip = np.concatenate((nxt[2:], [NEG, NEG]))
            beta[t] = np.where(skipOut, np.logaddexp(reach, skip), reach) + lp[t]

        with np.errstate(over="ignore"):
            gamma = np.exp(alpha + beta + nll)                 # (Tb, S)

        occupancy = np.zeros((Tb, V))
        for s in range(S):
            occupancy[:, ext[s]] += gamma[:, s]

        grad[:Tb, b] = (p[:Tb, b] - occupancy / np.maximum(p[:Tb, b], 1e-300)).astype(np.float32)

    return np.float32(nllTotal), grad, None
