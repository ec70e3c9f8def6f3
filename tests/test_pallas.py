import numpy as np
import jax.numpy as jnp


def testPallasMatmulInterpret():
    from puzzlelib_tpu.ops.pallas.matmul import matmul, matmulPadded

    np.random.seed(0)
    a = jnp.asarray(np.random.randn(256, 384), jnp.float32)
    b = jnp.asarray(np.random.randn(384, 256), jnp.float32)

    out = matmul(a, b, bm=128, bn=128, bk=128, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(a) @ np.asarray(b), atol=1e-4)


def testPallasMatmulPadding():
    from puzzlelib_tpu.ops.pallas.matmul import matmulPadded

    np.random.seed(1)
    a = jnp.asarray(np.random.randn(100, 200), jnp.float32)
    b = jnp.asarray(np.random.randn(200, 60), jnp.float32)

    out = matmulPadded(a, b, bm=128, bn=128, bk=128, interpret=True)
    assert out.shape == (100, 60)
    assert np.allclose(np.asarray(out), np.asarray(a) @ np.asarray(b), atol=1e-4)


def testPallasMatmulInt8Interpret():
    """int8 operands: exact int32 accumulation, int32 result (serving GEMM)."""
    from puzzlelib_tpu.ops.pallas.matmul import matmul, matmulPadded

    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randint(-127, 128, (256, 384)), jnp.int8)
    b = jnp.asarray(rng.randint(-127, 128, (384, 256)), jnp.int8)

    out = matmul(a, b, bm=128, bn=128, bk=128, interpret=True)
    want = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    assert out.dtype == jnp.int32
    assert np.array_equal(np.asarray(out), want)

    # ragged shapes through the padding wrapper (int8 sublane granule is 32)
    ar = jnp.asarray(rng.randint(-127, 128, (100, 200)), jnp.int8)
    br = jnp.asarray(rng.randint(-127, 128, (200, 60)), jnp.int8)
    outr = matmulPadded(ar, br, bm=128, bn=128, bk=128, interpret=True)
    assert outr.shape == (100, 60) and outr.dtype == jnp.int32
    assert np.array_equal(np.asarray(outr),
                          np.asarray(ar, np.int32) @ np.asarray(br, np.int32))


def testGemmAlgoDispatch():
    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.backend import gpuarray, blas as Blas

    np.random.seed(2)
    A = gpuarray.to_gpu(np.random.randn(64, 128).astype(np.float32))
    B = gpuarray.to_gpu(np.random.randn(128, 64).astype(np.float32))

    ref = Blas.mulMatrixOnMatrix(A, B).get()

    prev = Config.gemmAlgo
    try:
        Config.gemmAlgo = "pallas"
        out = Blas.mulMatrixOnMatrix(A, B).get()
    finally:
        Config.gemmAlgo = prev

    assert np.allclose(out, ref, atol=1e-4)


def testWinogradInterpret():
    """Fused Winograd F(2x2,3x3) kernel vs a float64 host oracle."""
    from puzzlelib_tpu.ops.pallas import winograd

    np.random.seed(7)

    for (n, c, h, w, co, p) in [
        (1, 128, 8, 8, 128, 1),
        (2, 128, 9, 7, 128, 0),
        (1, 128, 6, 10, 128, 1),
    ]:
        x = jnp.asarray(np.random.randn(n, c, h, w), jnp.float32)
        wt = jnp.asarray(np.random.randn(co, c, 3, 3) * 0.1, jnp.float32)

        out = winograd.conv2d(x, wt, (p, p), interpret=True)

        oh, ow = h + 2 * p - 2, w + 2 * p - 2
        xn = np.pad(np.asarray(x, np.float64), ((0, 0), (0, 0), (p, p), (p, p)))
        wn = np.asarray(wt, np.float64)

        ref = np.zeros((n, co, oh, ow))
        for i in range(3):
            for j in range(3):
                ref += np.einsum("nchw,oc->nohw", xn[:, :, i:i + oh, j:j + ow], wn[:, :, i, j])

        assert out.shape == (n, co, oh, ow)
        assert np.abs(np.asarray(out) - ref).max() < 1e-3 * max(1.0, np.abs(ref).max())


def testWinogradExplicitBlockInterpret():
    """An explicit non-default bi (multi-block row coverage) matches the
    picked-block result — the accumulated inverse transform must be
    block-partition-invariant."""
    from puzzlelib_tpu.ops.pallas import winograd

    np.random.seed(12)

    n, c, h, w, co, p = 1, 128, 10, 8, 128, 1
    x = jnp.asarray(np.random.randn(n, h, w, c), jnp.float32)
    wt = jnp.asarray(np.random.randn(co, c, 3, 3) * 0.1, jnp.float32)

    a = winograd.conv2dNHWC(x, wt, (p, p), interpret=True)
    b = winograd.conv2dNHWC(x, wt, (p, p), bi=1, interpret=True)

    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5


def testWinogradFilterGradInterpret():
    """Transform-domain bwd-filter vs a float64 host oracle."""
    from puzzlelib_tpu.ops.pallas import winograd

    np.random.seed(8)

    for (n, c, h, w, co, p) in [
        (2, 128, 8, 8, 128, 1),
        (1, 128, 9, 7, 128, 0),
    ]:
        oh, ow = h + 2 * p - 2, w + 2 * p - 2

        x = jnp.asarray(np.random.randn(n, h, w, c), jnp.float32)
        dy = jnp.asarray(np.random.randn(n, oh, ow, co) * 0.1, jnp.float32)

        dw = winograd.filterGradNHWC(x, dy, (p, p), interpret=True)

        xn = np.pad(np.asarray(x, np.float64), ((0, 0), (p, p), (p, p), (0, 0)))
        dyn = np.asarray(dy, np.float64)

        ref = np.zeros((co, c, 3, 3))
        for i in range(3):
            for j in range(3):
                ref[:, :, i, j] = np.einsum(
                    "nhwc,nhwo->oc", xn[:, i:i + oh, j:j + ow, :], dyn)

        assert dw.shape == (co, c, 3, 3)
        assert np.abs(np.asarray(dw) - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def testWinogradFilterGradMultiBlockInterpret():
    """Explicit bi forcing nBlocks >= 2: the multi-block accumulation path
    (the production geometry, e.g. th=14 -> bi=8 at (32,512,28,28)) must
    agree with the float64 host oracle — the default interpret-mode shapes
    pick nBlocks=1 and never reach it."""
    from puzzlelib_tpu.ops.pallas import winograd

    np.random.seed(18)

    n, c, h, w, co, p = 1, 128, 12, 8, 128, 1
    oh, ow = h + 2 * p - 2, w + 2 * p - 2      # oh 12 -> th 6; bi=2 -> 3 blocks

    x = jnp.asarray(np.random.randn(n, h, w, c), jnp.float32)
    dy = jnp.asarray(np.random.randn(n, oh, ow, co) * 0.1, jnp.float32)

    dw = winograd.filterGradNHWC(x, dy, (p, p), bi=2, interpret=True)

    xn = np.pad(np.asarray(x, np.float64), ((0, 0), (p, p), (p, p), (0, 0)))
    dyn = np.asarray(dy, np.float64)

    ref = np.zeros((co, c, 3, 3))
    for i in range(3):
        for j in range(3):
            ref[:, :, i, j] = np.einsum(
                "nhwc,nhwo->oc", xn[:, i:i + oh, j:j + ow, :], dyn)

    assert np.abs(np.asarray(dw) - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def testWinogradDataGradInterpret():
    """Rotated-filter bwd-data vs a float64 host oracle."""
    from puzzlelib_tpu.ops.pallas import winograd

    np.random.seed(9)

    n, c, h, w, co, p = 1, 128, 8, 8, 128, 1
    oh, ow = h + 2 * p - 2, w + 2 * p - 2

    wt = jnp.asarray(np.random.randn(co, c, 3, 3) * 0.1, jnp.float32)
    dy = jnp.asarray(np.random.randn(n, oh, ow, co), jnp.float32)

    dx = winograd.dataGradNHWC(dy, wt, (p, p), interpret=True)

    # oracle: dX[n, y, x, c] = sum dY[n, y - i + p, x - j + p, o] W[o, c, i, j]
    dyn = np.pad(np.asarray(dy, np.float64),
                 ((0, 0), (2 - p, 2 - p), (2 - p, 2 - p), (0, 0)))
    wn = np.asarray(wt, np.float64)[:, :, ::-1, ::-1]

    ref = np.zeros((n, h, w, c))
    for i in range(3):
        for j in range(3):
            ref += np.einsum("nhwo,oc->nhwc", dyn[:, i:i + h, j:j + w, :],
                             wn[:, :, i, j])

    assert dx.shape == (n, h, w, c)
    assert np.abs(np.asarray(dx) - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def testWinogradUnderShardMap():
    """The fused kernel composes with batch-sharded SPMD execution."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from puzzlelib_tpu.ops.pallas import winograd

    devs = jax.devices()
    if len(devs) < 4:
        return

    mesh = Mesh(np.array(devs[:4]), ("dp", ))

    np.random.seed(11)
    x = jnp.asarray(np.random.randn(4, 8, 8, 128), jnp.float32)
    w = jnp.asarray(np.random.randn(128, 128, 3, 3) * 0.1, jnp.float32)

    def conv(xs, ws):
        return winograd.conv2dNHWC(xs, ws, (1, 1), interpret=True)

    # check_vma=False: pallas_call outputs don't carry varying-mesh-axis
    # metadata (this is also how the parallel layer wraps pallas kernels)
    sharded = shard_map(conv, mesh=mesh, in_specs=(P("dp"), P()),
                        out_specs=P("dp"), check_vma=False)

    got = sharded(x, w)
    want = conv(x, w)

    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-4


def testWinogradApplicable():
    from puzzlelib_tpu.ops.pallas.winograd import applicable

    assert applicable((32, 256, 56, 56), (256, 256, 3, 3), (1, 1), (1, 1), (1, 1), 1)
    assert applicable((32, 128, 112, 112), (128, 128, 3, 3), (1, 1), (1, 1), (1, 1), 1)
    assert not applicable((32, 256, 56, 56), (256, 256, 3, 3), (2, 2), (1, 1), (1, 1), 1)
    assert not applicable((32, 64, 56, 56), (64, 64, 3, 3), (1, 1), (1, 1), (1, 1), 1)  # c % 128
    assert not applicable((32, 256, 56, 56), (256, 256, 5, 5), (2, 2), (1, 1), (1, 1), 1)


def testWinogradFGBlockAlignment():
    """Production FG blocks must keep MB = bi*twp sublane-aligned: Mosaic
    rejects the slab DMAs otherwise (v5e: (32,512,28,28) bi=14/mb=210 fails
    to compile, bi=8/mb=120 compiles)."""
    from puzzlelib_tpu.ops.pallas.winograd import _pickFG, _pickBlockFG

    # r50-28: th=14, twp=15 — the only aligned blocks are multiples of 8
    assert _pickFG(14, 15, 512, 512, 2) == (8, 128)

    for (th, twp, c, co) in [(14, 15, 512, 512), (28, 29, 256, 256),
                             (56, 57, 128, 128)]:
        picked = _pickFG(th, twp, c, co, 2)
        assert picked is not None and (picked[0] * twp) % 8 == 0

    # interpret mode (aligned=False) may use unaligned blocks so the small
    # CPU oracle shapes (twp=5: no aligned bi exists) stay testable
    assert _pickBlockFG(4, 5, 128, 128, 4, aligned=False) is not None
    assert _pickBlockFG(4, 5, 128, 128, 4, aligned=True) is None
