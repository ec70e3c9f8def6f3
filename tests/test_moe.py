"""Expert parallelism: sharded Switch MoE must equal the unsharded oracle
(reference has no ep — TPU extension)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from puzzlelib_tpu.parallel.moe import stackExpertParams, moeForward


N_EXPERTS = 4
DIM = 8


def expertFn(params, tokens):
    return jax.nn.relu(tokens @ params["w"]) @ params["w2"]


def makeParams(seed):
    rng = np.random.RandomState(seed)
    return [
        {
            "w": jnp.asarray(rng.randn(DIM, 16).astype(np.float32) * 0.3),
            "w2": jnp.asarray(rng.randn(16, DIM).astype(np.float32) * 0.3),
        }
        for _ in range(N_EXPERTS)
    ]


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:N_EXPERTS]), ("expert", ))


def oracle(gateW, paramsList, x, capacity):
    """Dense per-token routing with the same capacity-drop semantics."""
    probs = np.asarray(jax.nn.softmax(jnp.asarray(x) @ gateW, axis=-1))
    expert = probs.argmax(axis=-1)

    counts = {e: 0 for e in range(N_EXPERTS)}
    out = np.zeros_like(x)

    for i in range(x.shape[0]):
        e = int(expert[i])
        if counts[e] < capacity:
            counts[e] += 1
            y = np.asarray(expertFn(paramsList[e], jnp.asarray(x[i:i + 1])))
            out[i] = probs[i, e] * y[0]

    return out


def testMoEMatchesOracle(mesh):
    rng = np.random.RandomState(0)

    paramsList = makeParams(1)
    gateW = jnp.asarray(rng.randn(DIM, N_EXPERTS).astype(np.float32))
    x = rng.randn(32, DIM).astype(np.float32)

    capacity = int(np.ceil(1.25 * 32 / N_EXPERTS))

    out, aux = moeForward(expertFn, stackExpertParams(paramsList), gateW,
                          jnp.asarray(x), mesh, "expert", capacityFactor=1.25)

    ref = oracle(gateW, paramsList, x, capacity)

    assert np.allclose(np.asarray(out), ref, atol=1e-5)
    assert float(aux) > 0.0


def testMoETrains(mesh):
    rng = np.random.RandomState(2)

    stacked = stackExpertParams(makeParams(3))
    gateW = jnp.asarray(rng.randn(DIM, N_EXPERTS).astype(np.float32) * 0.1)

    x = jnp.asarray(rng.randn(32, DIM).astype(np.float32))
    target = jnp.asarray(np.tanh(rng.randn(32, DIM)).astype(np.float32))

    def loss(params, gw):
        out, aux = moeForward(expertFn, params, gw, x, mesh, "expert")
        return jnp.mean((out - target) ** 2) + 0.01 * aux

    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    first = None
    for _ in range(25):
        val, (gParams, gGate) = grad(stacked, gateW)
        stacked = jax.tree.map(lambda p, g: p - 0.3 * g, stacked, gParams)
        gateW = gateW - 0.3 * gGate
        if first is None:
            first = float(val)

    assert float(val) < first * 0.8, (first, float(val))


def testMoEModuleExperts(mesh):
    """Switch routing over Module-layer (user API) experts via functionalize."""
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.fused import functionalize, collectParamBuffers

    np.random.seed(21)

    def makeExpert():
        expert = Sequential()
        expert.append(Linear(DIM, 16, wscale=0.3, initscheme="gaussian"))
        expert.append(Activation(relu))
        expert.append(Linear(16, DIM, wscale=0.3, initscheme="gaussian"))
        return expert

    experts = [makeExpert() for _ in range(N_EXPERTS)]
    apply, _ = functionalize(makeExpert())

    perExpert = [[buf.jax for buf in collectParamBuffers(e)] for e in experts]
    stacked = stackExpertParams(perExpert)

    rng = np.random.RandomState(22)
    gateW = jnp.asarray(rng.randn(DIM, N_EXPERTS).astype(np.float32))
    x = jnp.asarray(rng.randn(4 * N_EXPERTS, DIM).astype(np.float32))

    out, aux = moeForward(apply, stacked, gateW, x, mesh, "expert")

    # oracle: identical routing with a raw-jax expert of the same weights
    def rawExpert(params, tok):
        w1, b1, w2, b2 = params
        return jax.nn.relu(tok @ w1 + b1) @ w2 + b2

    refOut, refAux = moeForward(rawExpert, stacked, gateW, x, mesh, "expert")

    assert np.allclose(np.asarray(out), np.asarray(refOut), atol=1e-5)
    assert np.allclose(float(aux), float(refAux), atol=1e-6)
