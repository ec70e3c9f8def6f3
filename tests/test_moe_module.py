"""Module-layer SwitchMoE and Pipeline containers: eager protocol, blueprint
and HDF5 round-trips, distributed paths on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from puzzlelib_tpu.backend import gpuarray


def _makeExpert(seed):
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, tanh

    np.random.seed(seed)
    s = Sequential()
    s.append(Linear(8, 8, initscheme="gaussian", wscale=0.4))
    s.append(Activation(tanh))
    return s


def _makeMoE(nExperts=4):
    from puzzlelib_tpu.modules import SwitchMoE

    moe = SwitchMoE(8, name="moe")
    for e in range(nExperts):
        moe.append(_makeExpert(100 + e))
    return moe


def testSwitchMoEForwardMatchesManualRouting():
    moe = _makeMoE()

    np.random.seed(0)
    x = np.random.randn(16, 8).astype(np.float32)

    out = moe(gpuarray.to_gpu(x)).get()
    assert out.shape == (16, 8)
    assert np.isfinite(out).all()
    assert float(moe.auxLoss.get()) > 0.0

    # manual oracle: same dispatch math + eager expert calls
    from puzzlelib_tpu.parallel.moe import _dispatch

    gateW = moe.gateVar.data.get()
    disp, comb, _ = _dispatch(jnp.asarray(gateW), jnp.asarray(x), 4, moe._capacity(16))
    expertIn = np.einsum("bec,bd->ecd", np.asarray(disp), x)

    outs = []
    for e, expert in enumerate(moe.graph):
        outs.append(expert(gpuarray.to_gpu(expertIn[e].astype(np.float32))).get())
        expert.reset()

    ref = np.einsum("bec,ecd->bd", np.asarray(comb), np.stack(outs))
    assert np.allclose(out, ref, atol=1e-5)


def testSwitchMoETrains():
    from puzzlelib_tpu.optimizers import MomentumSGD

    moe = _makeMoE()
    opt = MomentumSGD(learnRate=0.3, momRate=0.9)
    opt.setupOn(moe, useGlobalState=False)

    np.random.seed(1)
    x = np.random.randn(32, 8).astype(np.float32)
    w = np.random.randn(8, 8).astype(np.float32)
    target = np.tanh(x @ w)

    losses = []
    for _ in range(25):
        out = moe(gpuarray.to_gpu(x))
        diff = out.get() - target
        losses.append(float((diff ** 2).mean()))

        grad = gpuarray.to_gpu((-2.0 * diff / diff.size).astype(np.float32))
        opt.zeroGradParams()
        moe.backward(grad, updGrad=False)
        opt.update()
        moe.reset()

    assert losses[-1] < losses[0] * 0.9, losses


def testSwitchMoEBlueprintAndCheckpointRoundTrip(tmp_path):
    from puzzlelib_tpu.blueprint import load as bpLoad

    moe = _makeMoE()
    np.random.seed(2)
    x = np.random.randn(8, 8).astype(np.float32)
    ref = moe(gpuarray.to_gpu(x)).get()
    moe.reset()

    path = str(tmp_path / "moe.hdf")
    moe.save(path, withBlueprint=True)

    rebuilt = bpLoad(path)
    assert type(rebuilt).__name__ == "SwitchMoE"
    assert rebuilt.nExperts == 4

    out = rebuilt(gpuarray.to_gpu(x)).get()
    assert np.allclose(out, ref, atol=1e-6)


def testSwitchMoEDistributedMatchesEager():
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >= 4 devices")

    moe = _makeMoE(4)
    np.random.seed(3)
    x = np.random.randn(16, 8).astype(np.float32)

    eager = moe(gpuarray.to_gpu(x)).get()
    eagerAux = float(moe.auxLoss.get())
    moe.reset()

    mesh = Mesh(np.array(devices[:4]), ("expert", ))
    out, aux = moe.distributedForward(gpuarray.to_gpu(x), mesh)

    assert np.allclose(out.get(), eager, atol=1e-5)
    assert np.isclose(float(aux.get()), eagerAux, atol=1e-5)


def testPipelineEagerEqualsSequentialAndRoundTrip(tmp_path):
    from puzzlelib_tpu.containers import Pipeline
    from puzzlelib_tpu.blueprint import load as bpLoad

    pipe = Pipeline(name="pipe")
    for s in range(4):
        pipe.append(_makeExpert(200 + s))

    np.random.seed(4)
    x = np.random.randn(8, 8).astype(np.float32)

    out = pipe(gpuarray.to_gpu(x)).get()

    # eager pipeline == running the stages in sequence
    flow = x
    for stage in pipe.graph:
        stage.reset()
    for stage in pipe.graph:
        flow = stage(gpuarray.to_gpu(flow)).get()
        stage.reset()
    assert np.allclose(out, flow, atol=1e-6)

    pipe.reset()
    path = str(tmp_path / "pipe.hdf")
    pipe.save(path, withBlueprint=True)

    rebuilt = bpLoad(path)
    assert type(rebuilt).__name__ == "Pipeline"
    assert np.allclose(rebuilt(gpuarray.to_gpu(x)).get(), out, atol=1e-6)


def testPipelineDistributedGrad():
    from jax.sharding import Mesh
    from puzzlelib_tpu.containers import Pipeline

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >= 4 devices")

    pipe = Pipeline(name="pipe")
    for s in range(4):
        pipe.append(_makeExpert(300 + s))

    np.random.seed(5)
    x = np.random.randn(8, 8).astype(np.float32)
    target = np.random.randn(8, 8).astype(np.float32)

    mesh = Mesh(np.array(devices[:4]), ("stage", ))
    loss, grads = pipe.distributedGrad(
        lambda out, tgt: jnp.mean((out - tgt) ** 2),
        jnp.asarray(x), jnp.asarray(target), mesh, microbatches=4)

    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)

    # distributed forward == eager forward
    distOut = pipe.distributedForward(gpuarray.to_gpu(x), mesh, microbatches=4).get()
    eager = pipe(gpuarray.to_gpu(x)).get()
    pipe.reset()
    assert np.allclose(distOut, eager, atol=1e-5)

    # grads land back in the stage Variables through foldStageGrads
    pipe.zeroGradParams()
    pipe.foldStageGrads(grads)
    firstVar = pipe._stageVars(pipe.graph[0])[0]
    assert np.abs(firstVar.grad.get()).sum() > 0.0


def testPipelineFoldedTrainingMatchesEagerModulePath():
    """distributedGrad + foldStageGrads + Module-protocol optimizer must
    produce the SAME weights as the eager Sequential forward/backward/update
    on identical data — the full user-facing mesh training loop, numerically
    verified (not just 'grads are nonzero')."""
    from jax.sharding import Mesh
    from puzzlelib_tpu.containers import Pipeline
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >= 4 devices")

    def build():
        pipe = Pipeline(name="pipe")
        for s in range(4):
            pipe.append(_makeExpert(500 + s))
        return pipe

    np.random.seed(11)
    x = np.random.randn(8, 8).astype(np.float32)
    target = np.random.randn(8, 8).astype(np.float32)

    # mesh path
    mesh = Mesh(np.array(devices[:4]), ("stage", ))
    meshPipe = build()
    meshOpt = MomentumSGD(learnRate=0.1, momRate=0.9)
    meshOpt.setupOn(meshPipe, useGlobalState=False)

    def lossFn(out, tgt):
        # MSE cost semantics: error = dot(diff, diff) / (2 N)
        return 0.5 * jnp.mean((out - tgt) ** 2)

    for _ in range(3):
        _, grads = meshPipe.distributedGrad(lossFn, jnp.asarray(x), jnp.asarray(target),
                                            mesh, microbatches=4)
        meshPipe.zeroGradParams()
        meshPipe.foldStageGrads(grads)
        meshOpt.update()

    # eager Module path: same math (MSE cost grad = 2/N * (out - tgt))
    eagerPipe = build()
    eagerOpt = MomentumSGD(learnRate=0.1, momRate=0.9)
    eagerOpt.setupOn(eagerPipe, useGlobalState=False)
    cost = MSE()

    for _ in range(3):
        out = eagerPipe(gpuarray.to_gpu(x))
        grad = cost(out, gpuarray.to_gpu(target), queryError=False)
        eagerPipe.zeroGradParams()
        eagerPipe.backward(grad, updGrad=False)
        eagerOpt.update()
        eagerPipe.reset()

    from puzzlelib_tpu.fused import collectParamBuffers
    for a, b in zip(collectParamBuffers(meshPipe), collectParamBuffers(eagerPipe)):
        assert np.allclose(a.get(), b.get(), atol=1e-5), \
            "mesh-trained weights diverge from eager Module path"
