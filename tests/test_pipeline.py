"""Pipeline parallelism: GPipe schedule over a virtual stage mesh must equal
the plain sequential forward/backward (reference has no pp — TPU extension)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from puzzlelib_tpu.parallel.pipeline import stackStageParams, pipelineForward, pipelineGrad


N_STAGES = 4
DIM = 8


def blockFn(params, x):
    w, b = params["w"], params["b"]
    return jnp.tanh(x @ w + b)


def makeParams(seed):
    rng = np.random.RandomState(seed)
    return [
        {
            "w": jnp.asarray(rng.randn(DIM, DIM).astype(np.float32) * 0.5),
            "b": jnp.asarray(rng.randn(DIM).astype(np.float32) * 0.1),
        }
        for _ in range(N_STAGES)
    ]


def sequentialForward(paramsList, x):
    for p in paramsList:
        x = blockFn(p, x)
    return x


@pytest.fixture
def mesh():
    devices = np.array(jax.devices()[:N_STAGES])
    return Mesh(devices, ("stage", ))


def testPipelineForwardMatchesSequential(mesh):
    paramsList = makeParams(0)
    stacked = stackStageParams(paramsList)

    x = jnp.asarray(np.random.RandomState(1).randn(16, DIM).astype(np.float32))

    out = pipelineForward(blockFn, stacked, x, mesh, "stage", microbatches=4)
    ref = sequentialForward(paramsList, x)

    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def testPipelineGradMatchesSequential(mesh):
    paramsList = makeParams(2)
    stacked = stackStageParams(paramsList)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, DIM).astype(np.float32))
    target = jnp.asarray(rng.randn(8, DIM).astype(np.float32))

    def lossFn(out, tgt):
        return jnp.mean((out - tgt) ** 2)

    loss, grads = pipelineGrad(blockFn, lossFn, stacked, x, target, mesh, "stage", microbatches=4)

    def seqLoss(stackedP):
        h = x
        for i in range(N_STAGES):
            h = blockFn(jax.tree.map(lambda p: p[i], stackedP), h)
        return lossFn(h, target)

    refLoss, refGrads = jax.value_and_grad(seqLoss)(stacked)

    assert np.allclose(float(loss), float(refLoss), atol=1e-6)
    for key in ("w", "b"):
        assert np.allclose(np.asarray(grads[key]), np.asarray(refGrads[key]), atol=1e-4), key


def testPipelineTrainingDecreasesLoss(mesh):
    paramsList = makeParams(4)
    stacked = stackStageParams(paramsList)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(16, DIM).astype(np.float32))
    target = jnp.asarray(np.tanh(rng.randn(16, DIM)).astype(np.float32))

    def lossFn(out, tgt):
        return jnp.mean((out - tgt) ** 2)

    first = None
    for i in range(20):
        loss, grads = pipelineGrad(blockFn, lossFn, stacked, x, target, mesh, "stage", microbatches=4)
        stacked = jax.tree.map(lambda p, g: p - 0.5 * g, stacked, grads)
        if first is None:
            first = float(loss)

    assert float(loss) < first * 0.7, (first, float(loss))


def testPipelineValidation(mesh):
    stacked = stackStageParams(makeParams(6))
    x = jnp.zeros((10, DIM), jnp.float32)

    with pytest.raises(ValueError, match="microbatches"):
        pipelineForward(blockFn, stacked, x, mesh, "stage", microbatches=4)

    def badBlock(params, xx):
        return jnp.concatenate([xx, xx], axis=1)

    with pytest.raises(ValueError, match="preserve activation shape"):
        pipelineForward(badBlock, stacked, jnp.zeros((8, DIM), jnp.float32), mesh, "stage", microbatches=4)


def testPipelineModuleStages(mesh):
    """GPipe schedule driving Module-layer (user API) stages via functionalize."""
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, tanh
    from puzzlelib_tpu.fused import functionalize, collectParamBuffers

    np.random.seed(7)

    def makeStage():
        stage = Sequential()
        stage.append(Linear(DIM, DIM, wscale=0.5, initscheme="gaussian"))
        stage.append(Activation(tanh))
        return stage

    stages = [makeStage() for _ in range(N_STAGES)]
    apply, _ = functionalize(makeStage())

    perStage = [[buf.jax for buf in collectParamBuffers(s)] for s in stages]
    stacked = stackStageParams(perStage)

    rng = np.random.RandomState(8)
    x = rng.randn(16, DIM).astype(np.float32)

    out = pipelineForward(apply, stacked, jnp.asarray(x), mesh, "stage", microbatches=4)

    # oracle: the same Module nets applied sequentially through the user API
    cur = x
    for stage in stages:
        cur = stage(gpuarray.to_gpu(cur)).get()

    assert np.allclose(np.asarray(out), cur, atol=1e-5)

    # grads through the pipelined Module stages == grads of the sequential jax compose
    target = jnp.asarray(rng.randn(16, DIM).astype(np.float32))

    def lossFn(o, tgt):
        return jnp.mean((o - tgt) ** 2)

    loss, grads = pipelineGrad(apply, lossFn, stacked, jnp.asarray(x), target,
                               mesh, "stage", microbatches=4)

    def seqLoss(stackedP):
        h = jnp.asarray(x)
        for i in range(N_STAGES):
            h = apply(jax.tree.map(lambda p: p[i], stackedP), h)
        return lossFn(h, target)

    refLoss, refGrads = jax.value_and_grad(seqLoss)(stacked)

    assert np.allclose(float(loss), float(refLoss), atol=1e-6)
    for g, rg in zip(grads, refGrads):
        assert np.allclose(np.asarray(g), np.asarray(rg), atol=1e-4)
