"""Attention stack: flash kernel vs XLA oracle, module gradients, transformer
training (TPU extension — reference has no attention)."""

import numpy as np
import pytest

import jax.numpy as jnp

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.ops.attention import attention
from puzzlelib_tpu.ops.pallas.flash import flashAttention


@pytest.mark.parametrize("causal", [False, True])
def testFlashMatchesXla(causal):
    np.random.seed(0)

    q = jnp.asarray(np.random.randn(2, 3, 64, 16).astype(np.float32))
    k = jnp.asarray(np.random.randn(2, 3, 64, 16).astype(np.float32))
    v = jnp.asarray(np.random.randn(2, 3, 64, 16).astype(np.float32))

    ref = attention(q, k, v, causal=causal)
    out = flashAttention(q, k, v, causal=causal, blockQ=32, blockK=16, interpret=True)

    # on the real chip the two paths differ by more than reduction order: the
    # flash kernel stages Q/K/V tiles through bf16 MXU operands (outputs show
    # bf16 quantization; measured ~2e-3 relative on v5e 2026-08-20), while the
    # XLA oracle runs bf16x3.  On CPU both are IEEE f32.
    import jax
    if jax.devices()[0].platform == "cpu":
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    else:
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-2)


@pytest.mark.parametrize("causal", [False, True])
def testFlashBackwardMatchesXlaVjp(causal):
    """The custom VJP (Pallas flash backward, blockwise recompute) against the
    XLA attention VJP; self-attention lengths."""
    import jax

    np.random.seed(4)

    b, h, s, d = 2, 3, 64, 16
    q = jnp.asarray(np.random.randn(b, h, s, d).astype(np.float32))
    k = jnp.asarray(np.random.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(np.random.randn(b, h, s, d).astype(np.float32))
    do = jnp.asarray(np.random.randn(b, h, s, d).astype(np.float32))

    out, vjp = jax.vjp(lambda a, bb, c: flashAttention(a, bb, c, causal, 32, 16, True), q, k, v)
    ref, refVjp = jax.vjp(lambda a, bb, c: attention(a, bb, c, causal=causal), q, k, v)

    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    for g, r in zip(vjp(do), refVjp(do)):
        assert np.allclose(np.asarray(g), np.asarray(r), atol=2e-2)


def testMhaGradients():
    np.random.seed(1)

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import MultiHeadAttention, Flatten, Linear
    from puzzlelib_tpu.cost import MSE
    from testlib.gradientcheck import gradientCheck

    net = Sequential()
    net.append(MultiHeadAttention(8, 2, initscheme=("xavier", "avg")))
    net.append(Flatten())
    net.append(Linear(4 * 8, 5))

    data = gpuarray.to_gpu(np.random.randn(1, 4, 8).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randn(1, 5).astype(np.float32))

    errors = gradientCheck(net, data, target, MSE(), h=1e-3, log=False)
    assert np.median(errors) < 1e-2, "median rel error %s" % np.median(errors)


def testLayerNormGradients():
    np.random.seed(2)

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import LayerNorm, Flatten, Linear
    from puzzlelib_tpu.cost import MSE
    from testlib.gradientcheck import gradientCheck

    net = Sequential()
    net.append(Linear(6, 8))
    net.append(LayerNorm(8))
    net.append(Linear(8, 3))

    data = gpuarray.to_gpu(np.random.randn(2, 6).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randn(2, 3).astype(np.float32))

    errors = gradientCheck(net, data, target, MSE(), h=1e-3, log=False)
    assert np.median(errors) < 1e-2, "median rel error %s" % np.median(errors)


def testTransformerTrains():
    np.random.seed(3)

    from puzzlelib_tpu.models.nets.transformer import buildTransformerClassifier
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import Adam
    from puzzlelib_tpu.fused import FusedStep

    vocab, seq, emb, nclasses = 20, 8, 16, 3
    net = buildTransformerClassifier(vocab, seq, emb, nheads=2, nlayers=2, nclasses=nclasses)

    data = np.random.randint(0, vocab, size=(16, seq)).astype(np.int32)
    labels = (data.sum(axis=1) % nclasses).astype(np.int32)   # learnable rule

    opt = Adam(alpha=0.01)
    opt.setupOn(net, useGlobalState=True)
    cost = CrossEntropy(maxlabels=nclasses)
    step = FusedStep(net, cost, opt)

    first = None
    for i in range(30):
        step(data, labels)
        err = cost.getError()
        if first is None:
            first = err

    assert err < first * 0.9, "transformer loss did not decrease (%s -> %s)" % (first, err)

    # blueprint round-trip of the new modules
    from puzzlelib_tpu import blueprint as Blueprint
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "tf.hdf")
        net.save(path, withBlueprint=True)
        net2 = Blueprint.load(path)

        out1 = net(gpuarray.to_gpu(data)).get()
        net.reset()
        out2 = net2(gpuarray.to_gpu(data)).get()
        assert np.allclose(out1, out2, atol=1e-5)


def testAutoDispatchResolution():
    """attentionAlgo="auto" resolves through the measured table with the
    long-sequence structural prior as fallback; explicit algos pass through."""
    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.ops import attention as attnops

    saved = Config.attentionAlgo
    savedTable = dict(attnops._attnChoice)
    try:
        Config.attentionAlgo = "auto"

        # CPU platform: always XLA (Mosaic is interpret-only there); on a
        # real TPU the long-sequence bf16 structural prior picks flash
        import jax
        onCpu = jax.devices()[0].platform == "cpu"
        expected = "xla" if onCpu else "flash"
        assert attnops.resolveAlgo(4, 8, 4096, 64, False, "bfloat16") == expected

        # a measured winner overrides the prior (platform check fires first on
        # CPU, so exercise the table through a fake non-cpu path is not
        # possible here; assert the table lookup shape contract instead)
        key = attnops._signature(4, 8, 2048, 64, True, "bfloat16")
        attnops._attnChoice[key] = "flash"
        assert key in attnops._attnChoice

        # explicit modes pass straight through resolveAlgo's config gate
        Config.attentionAlgo = "flash"
        assert attnops.resolveAlgo(4, 8, 128, 64, False, "float32") == "flash"
        Config.attentionAlgo = "xla"
        assert attnops.resolveAlgo(4, 8, 8192, 64, False, "bfloat16") == "xla"
    finally:
        Config.attentionAlgo = saved
        attnops._attnChoice.clear()
        attnops._attnChoice.update(savedTable)
