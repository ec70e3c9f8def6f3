"""Expert parallelism: a Switch-style top-1 mixture-of-experts layer.

The reference has no MoE / expert parallelism (its only distribution mode is
the data-parallel grid, /root/reference/Grid.py); this is a TPU-native
extension completing the parallelism palette (dp/tp/pp/ep). The classic
Mesh-TensorFlow formulation: top-1 gating builds a (tokens, experts, capacity)
one-hot dispatch tensor, two einsums scatter/gather tokens, and ``shard_map``
splits the expert dimension over a mesh axis so each device runs only its
local experts — XLA inserts the (all-gather of dispatched tokens, psum of
combined outputs) collectives over ICI.

    stacked = stackExpertParams([p0, p1, ...])       # leading expert axis
    out, auxLoss = moeForward(expertFn, stacked, gateW, x, mesh, "expert")

``expertFn(params, tokens) -> tokens`` maps (C, d) -> (C, d) for one expert.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from puzzlelib_tpu.parallel.pipeline import shard_map


def stackExpertParams(paramsList):
    """Stack per-expert parameter pytrees along a new leading expert axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *paramsList)


def _dispatch(gateW, x, nExperts, capacity):
    """Top-1 routing: returns (dispatch (B, E, C), combine (B, E, C), auxLoss)."""
    logits = x @ gateW                                        # (B, E)
    probs = jax.nn.softmax(logits, axis=-1)

    expert = jnp.argmax(probs, axis=-1)                       # (B, )
    gate = jnp.take_along_axis(probs, expert[:, None], axis=1)[:, 0]

    onehot = jax.nn.one_hot(expert, nExperts, dtype=x.dtype)  # (B, E)

    # position of each token within its expert's buffer; drop beyond capacity
    position = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot    # (B, E)
    keep = position < capacity

    dispatch = onehot[:, :, None] * keep[:, :, None] * jax.nn.one_hot(
        position.astype(jnp.int32), capacity, dtype=x.dtype
    )                                                         # (B, E, C)

    combine = dispatch * gate[:, None, None]

    # Switch load-balancing loss: E * sum_e fraction_e * meanprob_e
    fraction = jnp.mean(onehot, axis=0)
    meanProb = jnp.mean(probs, axis=0)
    auxLoss = nExperts * jnp.sum(fraction * meanProb)

    return dispatch, combine, auxLoss


def moeForward(expertFn, stackedParams, gateW, x, mesh, expertAxis="expert",
               capacityFactor=1.25):
    """(B, d) -> (B, d) through sharded experts; returns (out, auxLoss).

    Tokens overflowing an expert's capacity ``ceil(capacityFactor * B / E)``
    are dropped (standard Switch behavior) — their output is zero.
    """
    nExperts = jax.tree.leaves(stackedParams)[0].shape[0]
    batch = x.shape[0]

    if gateW.shape[-1] != nExperts:
        raise ValueError("Gate width %d does not match expert count %d" %
                         (gateW.shape[-1], nExperts))

    capacity = int(np.ceil(capacityFactor * batch / nExperts))

    dispatch, combine, auxLoss = _dispatch(gateW, x, nExperts, capacity)

    expertIn = jnp.einsum("bec,bd->ecd", dispatch, x)         # (E, C, d)

    def runLocal(params, tokens):
        # tokens (Elocal, C, d): map expertFn over this shard's experts
        return jax.vmap(expertFn)(params, tokens)

    paramSpec = jax.tree.map(lambda _: P(expertAxis), stackedParams)

    expertOut = shard_map(
        runLocal, mesh, (paramSpec, P(expertAxis)), P(expertAxis)
    )(stackedParams, expertIn)                                # (E, C, d)

    out = jnp.einsum("bec,ecd->bd", combine, expertOut)
    return out, auxLoss
