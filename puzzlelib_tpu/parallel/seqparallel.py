"""Sequence parallelism: activations sharded along the token dim between
tensor-parallel regions (Megatron-SP).

The reference has no sequence parallelism (/root/reference/Grid.py is plain
DP); this is the TPU-native extension. Between TP matmuls, activations live
sharded along the batch/sequence dim — elementwise work (norms, dropout,
residuals) runs shard-local — and the TP region is entered with an
``all_gather`` and exited with a ``psum_scatter`` (reduce-scatter), the two
collectives riding ICI. This halves activation memory versus plain TP, which
keeps activations replicated.

    out = seqParallelMLP(x, w1, w2, mesh, axis="model")

x (B, d) sharded P(axis) on dim 0; w1 (d, f) sharded P(None, axis);
w2 (f, d) sharded P(axis, None); out sharded like x.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from puzzlelib_tpu.parallel.pipeline import shard_map


def seqParallelMLP(x, w1, w2, mesh, axis="model", activation=jax.nn.gelu):
    """gelu(x @ w1) @ w2 with sequence-sharded activations and TP weights.

    Per shard: all-gather tokens -> local column block of w1 -> activation ->
    local row block of w2 (partial sums) -> reduce-scatter back to
    sequence-sharded. Exactly two collectives per MLP, both on ICI.
    """
    nShards = mesh.shape[axis]

    if x.shape[0] % nShards != 0:
        raise ValueError("Token dim %d not divisible by %d '%s' shards" %
                         (x.shape[0], nShards, axis))
    if w1.shape[1] % nShards != 0 or w2.shape[0] % nShards != 0:
        raise ValueError("Hidden dim %d not divisible by %d '%s' shards" %
                         (w1.shape[1], nShards, axis))

    def block(xl, w1l, w2l):
        xg = lax.all_gather(xl, axis, axis=0, tiled=True)     # (B, d) enter TP
        h = activation(xg @ w1l)                              # (B, f/N) local
        partial = h @ w2l                                     # (B, d) partial
        return lax.psum_scatter(partial, axis, scatter_dimension=0, tiled=True)

    return shard_map(
        block, mesh, (P(axis), P(None, axis), P(axis, None)), P(axis)
    )(x, w1, w2)
