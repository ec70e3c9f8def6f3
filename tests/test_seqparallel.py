"""Sequence parallelism: sp+tp MLP must equal the dense oracle."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from puzzlelib_tpu.parallel.seqparallel import seqParallelMLP

import pytest


def testSeqParallelMLPMatchesDense():
    rng = np.random.RandomState(0)
    mesh = Mesh(np.array(jax.devices()[:8]), ("model", ))

    x = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    w1 = jnp.asarray(rng.randn(16, 64).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(64, 16).astype(np.float32) * 0.2)

    out = seqParallelMLP(x, w1, w2, mesh, axis="model")
    ref = jax.nn.gelu(x @ w1) @ w2

    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def testSeqParallelGrad():
    rng = np.random.RandomState(1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model", ))

    x = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    w1 = jnp.asarray(rng.randn(8, 32).astype(np.float32) * 0.3)
    w2 = jnp.asarray(rng.randn(32, 8).astype(np.float32) * 0.3)
    t = jnp.asarray(rng.randn(16, 8).astype(np.float32))

    def lossSp(w1_, w2_):
        return jnp.mean((seqParallelMLP(x, w1_, w2_, mesh) - t) ** 2)

    def lossRef(w1_, w2_):
        return jnp.mean((jax.nn.gelu(x @ w1_) @ w2_ - t) ** 2)

    g1 = jax.grad(lossSp, argnums=(0, 1))(w1, w2)
    g2 = jax.grad(lossRef, argnums=(0, 1))(w1, w2)

    for a, b in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def testSeqParallelValidation():
    mesh = Mesh(np.array(jax.devices()[:4]), ("model", ))

    with pytest.raises(ValueError, match="Token dim"):
        seqParallelMLP(jnp.zeros((10, 8)), jnp.zeros((8, 32)), jnp.zeros((32, 8)), mesh)

    with pytest.raises(ValueError, match="Hidden dim"):
        seqParallelMLP(jnp.zeros((16, 8)), jnp.zeros((8, 30)), jnp.zeros((30, 8)), mesh)
