import numpy as np

from puzzlelib_tpu.backend import gpuarray


def testGridMeanValueAndSumTensor():
    from puzzlelib_tpu.grid import runGrid

    results = {}

    def target(nodeinfo):
        v = nodeinfo.meanValue(float(nodeinfo.index))
        results[("mean", nodeinfo.index)] = v

        t = gpuarray.to_gpu(np.full((4, ), float(nodeinfo.index + 1), np.float32))
        nodeinfo.sumTensor("grad", t)
        results[("tensor", nodeinfo.index)] = t.get()

    runGrid(target, 4)

    for i in range(4):
        assert results[("mean", i)] == 1.5
        assert np.allclose(results[("tensor", i)], 2.5)


def testGridDataParallelTraining():
    """Reference MultiGPU pattern: Optimizer(nodeinfo=...) with global state."""
    from puzzlelib_tpu.grid import runGrid
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD

    np.random.seed(0)
    fullData = np.random.randn(16, 8).astype(np.float32)
    fullTarget = np.random.randn(16, 4).astype(np.float32)

    finalWeights = {}
    errors = {}

    def train(nodeinfo):
        np.random.seed(42)  # identical init on every node

        seq = Sequential()
        seq.append(Linear(8, 6))
        seq.append(Activation(relu))
        seq.append(Linear(6, 4))

        optimizer = MomentumSGD(learnRate=0.05, nodeinfo=nodeinfo)
        optimizer.setupOn(seq, useGlobalState=True)

        shard = slice(nodeinfo.index * 8, (nodeinfo.index + 1) * 8)
        data = gpuarray.to_gpu(fullData[shard])
        target = gpuarray.to_gpu(fullTarget[shard])

        mse = MSE()

        for i in range(5):
            error, grad = mse(seq(data), target)

            optimizer.zeroGradParams()
            seq.backward(grad)
            optimizer.update()

        errors[nodeinfo.index] = nodeinfo.meanValue(error)
        finalWeights[nodeinfo.index] = seq[0].W.get()

    runGrid(train, 2)

    # weights stay in lockstep across nodes (same mean gradient applied)
    assert np.allclose(finalWeights[0], finalWeights[1], atol=1e-5)
    assert errors[0] == errors[1]


def testFusedMeshDataParallel():
    import jax
    from jax.sharding import Mesh

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("data", ))

    np.random.seed(1)

    def build():
        np.random.seed(7)
        seq = Sequential()
        seq.append(Linear(8, 6))
        seq.append(Activation(relu))
        seq.append(Linear(6, 4))
        return seq

    data = np.random.randn(4 * ndev, 8).astype(np.float32)
    target = np.random.randn(4 * ndev, 4).astype(np.float32)

    # sharded run
    seq = build()
    opt = MomentumSGD(learnRate=0.05)
    opt.setupOn(seq, useGlobalState=True)
    cost = MSE()
    step = FusedStep(seq, cost, opt, mesh=mesh)

    for _ in range(3):
        step(data, target)
    shardedW = seq[0].W.get()

    # single-device oracle
    seqS = build()
    optS = MomentumSGD(learnRate=0.05)
    optS.setupOn(seqS, useGlobalState=True)
    costS = MSE()
    stepS = FusedStep(seqS, costS, optS)

    for _ in range(3):
        stepS(data, target)

    assert np.allclose(shardedW, seqS[0].W.get(), atol=1e-5), "mesh DP diverges from single-device"


def testFusedTensorParallelMatchesSingle():
    import jax
    from jax.sharding import Mesh

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep, tensorParallelSpecs

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))

    def build():
        np.random.seed(11)
        seq = Sequential()
        seq.append(Linear(16, 32))
        seq.append(Activation(relu))
        seq.append(Linear(32, 8))
        return seq

    np.random.seed(12)
    data = np.random.randn(8, 16).astype(np.float32)
    target = np.random.randn(8, 8).astype(np.float32)

    # dp x tp sharded run
    seq = build()
    opt = MomentumSGD(learnRate=0.05, momRate=0.9)
    opt.setupOn(seq, useGlobalState=False)
    cost = MSE()

    shardings = tensorParallelSpecs(seq, cost, opt, mesh, modelAxis="model")
    step = FusedStep(seq, cost, opt, mesh=mesh, stateShardings=shardings)

    for _ in range(3):
        step(data, target)
    shardedW = seq[0].W.get()

    # single-device oracle
    seqS = build()
    optS = MomentumSGD(learnRate=0.05, momRate=0.9)
    optS.setupOn(seqS, useGlobalState=False)
    costS = MSE()
    stepS = FusedStep(seqS, costS, optS)

    for _ in range(3):
        stepS(data, target)

    assert np.allclose(shardedW, seqS[0].W.get(), atol=1e-5), "tensor parallel diverges"


def testFusedZeroOptimizerSharding():
    """ZeRO-1: optimizer state sharded over the data axis, numerics unchanged."""
    import jax
    from jax.sharding import Mesh, NamedSharding

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import Adam
    from puzzlelib_tpu.fused import FusedStep, zeroOptimizerSpecs

    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("data", ))

    def build():
        np.random.seed(17)
        seq = Sequential()
        seq.append(Linear(8, 8 * ndev))
        seq.append(Activation(relu))
        seq.append(Linear(8 * ndev, 4))
        return seq

    np.random.seed(18)
    data = np.random.randn(2 * ndev, 8).astype(np.float32)
    target = np.random.randn(2 * ndev, 4).astype(np.float32)

    seq = build()
    opt = Adam(alpha=0.01)
    opt.setupOn(seq, useGlobalState=False)
    cost = MSE()

    shardings = zeroOptimizerSpecs(seq, cost, opt, mesh, dataAxis="data")
    step = FusedStep(seq, cost, opt, mesh=mesh, dataAxis="data", stateShardings=shardings)

    for _ in range(3):
        step(data, target)

    # at least one optimizer state buffer must actually be sharded on "data"
    sharded = 0
    for name, state in opt.states.items():
        for entity in state.values():
            sh = entity.jax.sharding
            if isinstance(sh, NamedSharding) and "data" in (sh.spec or ()):
                sharded += 1
    assert sharded > 0, "no optimizer state buffer ended up sharded"

    # numerics must match the single-device run
    seqS = build()
    optS = Adam(alpha=0.01)
    optS.setupOn(seqS, useGlobalState=False)
    costS = MSE()
    stepS = FusedStep(seqS, costS, optS)

    for _ in range(3):
        stepS(data, target)

    assert np.allclose(seq[0].W.get(), seqS[0].W.get(), atol=1e-5), "ZeRO sharding changed numerics"


def testFusedMeshRaggedBatch():
    """A batch that does not divide over the data axis dispatches through the
    replicated-input fallback and matches the single-device step exactly."""
    import jax
    from jax.sharding import Mesh

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    ndev = len(jax.devices())
    if ndev < 2:
        return

    mesh = Mesh(np.array(jax.devices()), axis_names=("data", ))

    def build():
        np.random.seed(17)
        seq = Sequential()
        seq.append(Linear(8, 6))
        seq.append(Activation(relu))
        seq.append(Linear(6, 4))
        return seq

    np.random.seed(11)
    batch = 2 * ndev + 3                       # not divisible by ndev
    data = np.random.randn(batch, 8).astype(np.float32)
    target = np.random.randn(batch, 4).astype(np.float32)

    seq = build()
    opt = MomentumSGD(learnRate=0.05)
    opt.setupOn(seq, useGlobalState=True)
    cost = MSE()
    step = FusedStep(seq, cost, opt, mesh=mesh)

    step(data, target)
    err = cost.getMeanError()

    seqS = build()
    optS = MomentumSGD(learnRate=0.05)
    optS.setupOn(seqS, useGlobalState=True)
    costS = MSE()
    stepS = FusedStep(seqS, costS, optS)

    stepS(data, target)

    assert np.isfinite(err)
    assert np.allclose(seq[0].W.get(), seqS[0].W.get(), atol=1e-5)
    assert abs(err - costS.getMeanError()) < 1e-5


def testDisablePallasGatesGemmAndFlash(monkeypatch):
    """Mesh tracing must suppress EVERY Pallas path, not just convs: the
    GSPMD partitioner cannot shard an opaque pallas_call and would replicate
    its operands across the mesh."""
    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.backend import blas
    from puzzlelib_tpu.ops import conv as opsconv
    from puzzlelib_tpu.ops import attention
    from puzzlelib_tpu.tensor import GPUArray

    monkeypatch.setattr(Config, "gemmAlgo", "pallas")

    A = GPUArray(jnp.zeros((256, 256), jnp.float32))
    B = GPUArray(jnp.zeros((256, 256), jnp.float32))

    assert blas._pallasGemmTiles(A, B) is not None
    with opsconv.disablePallas():
        assert blas._pallasGemmTiles(A, B) is None

    x = jnp.zeros((2, 8, 32), jnp.float32)
    wq = wk = wv = wo = jnp.zeros((32, 32), jnp.float32)

    def makeMha():
        # a FRESH closure per trace: jax.make_jaxpr caches on the outer
        # function object, which would mask the inner dispatch entirely
        def mha(*args):
            return attention.mhaForward(*args, None, None, None, None,
                                        nheads=4, causal=False, algo="flash")
        return mha

    ungated = str(jax.make_jaxpr(makeMha())(x, wq, wk, wv, wo))
    assert "pallas_call" in ungated, "flash trace should embed a pallas_call"

    # the same signature traced inside the gate must NOT replay the cached
    # flash jaxpr (the gate state is part of the jit cache key)
    with opsconv.disablePallas():
        gated = str(jax.make_jaxpr(makeMha())(x, wq, wk, wv, wo))
    assert "pallas_call" not in gated

    # ... and leaving the gate must not pin the XLA-only trace either
    after = str(jax.make_jaxpr(makeMha())(x, wq, wk, wv, wo))
    assert "pallas_call" in after


def testMeshStepHloContainsCollectives():
    """White-box GSPMD check: the partitioned DP train step must synchronize
    gradients with a cross-device collective (all-reduce), i.e. the SPMD
    partitioner actually sharded the step instead of replicating it."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    ndev = len(jax.devices())
    if ndev < 2:
        import pytest
        pytest.skip("needs a multi-device mesh")

    mesh = Mesh(np.array(jax.devices()), axis_names=("data", ))

    seq = Sequential()
    seq.append(Linear(8, 6))
    seq.append(Activation(relu))
    seq.append(Linear(6, 4))
    opt = MomentumSGD(learnRate=0.05)
    opt.setupOn(seq, useGlobalState=True)
    step = FusedStep(seq, MSE(), opt, mesh=mesh)

    data = jnp.zeros((4 * ndev, 8), jnp.float32)
    target = jnp.zeros((4 * ndev, 4), jnp.float32)

    state = [buf.jax for buf in step.buffers]
    originals = list(state)
    hyper = step._hyper()

    try:
        lowered = step._jitted.lower(state, hyper,
                                     jnp.asarray(1.0, jnp.float32),
                                     jax.random.key(0), data, target)
        hlo = lowered.compile().as_text()
    finally:
        # _traceStep leaves traced values in the live buffers; restore
        for buf, arr in zip(step.buffers, originals):
            buf._write(arr)
        seq.reset()

    assert "all-reduce" in hlo, "DP grad sync must lower to an all-reduce"


def testFusedMeshDataParallelHwioCarry():
    """GSPMD DP step with the channels-last conv-weight carry: the carry
    permutes are inside the jitted program, boundary shardings stay logical."""
    import jax
    from jax.sharding import Mesh

    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, Activation, relu, Flatten, Linear
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("data", ))

    def build():
        np.random.seed(9)
        seq = Sequential()
        seq.append(Conv2D(2, 4, 3, pad=1))
        seq.append(Activation(relu))
        seq.append(Flatten())
        seq.append(Linear(4 * 6 * 6, 5))
        return seq

    np.random.seed(2)
    data = np.random.randn(2 * ndev, 2, 6, 6).astype(np.float32)
    target = np.random.randn(2 * ndev, 5).astype(np.float32)

    saved = Config.fusedConvLayout
    Config.fusedConvLayout = "hwio"
    try:
        seq = build()
        opt = MomentumSGD(learnRate=0.05, momRate=0.9)
        opt.setupOn(seq, useGlobalState=False)
        step = FusedStep(seq, MSE(), opt, mesh=mesh)
        assert step._carry, "conv weight slots not marked"

        for _ in range(2):
            step(data, target)
        meshW = seq[0].W.get()
    finally:
        Config.fusedConvLayout = saved

    seqS = build()
    optS = MomentumSGD(learnRate=0.05, momRate=0.9)
    optS.setupOn(seqS, useGlobalState=False)
    stepS = FusedStep(seqS, MSE(), optS)
    for _ in range(2):
        stepS(data, target)

    assert np.allclose(meshW, seqS[0].W.get(), atol=1e-5), \
        "hwio carry under mesh DP diverges from single-device logical"
