import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray, blas as Blas, dnn as Dnn, memory as Memory
from puzzlelib_tpu.backend.kernels import matvec as MatVec, costs as Costs


def testGemm():
    A = np.random.randn(7, 5).astype(np.float32)
    B = np.random.randn(5, 3).astype(np.float32)

    out = Blas.mulMatrixOnMatrix(gpuarray.to_gpu(A), gpuarray.to_gpu(B))
    assert np.allclose(out.get(), A @ B, atol=1e-5)

    outT = Blas.mulMatrixOnMatrix(gpuarray.to_gpu(A), gpuarray.to_gpu(B.T), transpB=True)
    assert np.allclose(outT.get(), A @ B, atol=1e-5)

    # accumulation: out = alpha*A@B + beta*out
    C = np.random.randn(7, 3).astype(np.float32)
    outAcc = gpuarray.to_gpu(C.copy())
    Blas.mulMatrixOnMatrix(gpuarray.to_gpu(A), gpuarray.to_gpu(B), out=outAcc, alpha=2.0, beta=0.5)
    assert np.allclose(outAcc.get(), 2.0 * A @ B + 0.5 * C, atol=1e-5)


def testGemmWritesThroughSharedView():
    sh = gpuarray.SharedArray(np.float32)
    sh.register((4, 3), np.float32, "w")
    sh.build()

    wgrad = sh["w"]

    A = np.random.randn(5, 4).astype(np.float32)
    G = np.random.randn(5, 3).astype(np.float32)

    Blas.mulMatrixOnMatrix(gpuarray.to_gpu(A), gpuarray.to_gpu(G), out=wgrad, transpA=True)
    assert np.allclose(sh.ary.get()[:12].reshape(4, 3), A.T @ G, atol=1e-5)


def testBatchedGemm():
    A = np.random.randn(4, 6, 5).astype(np.float32)  # gbp: (groups, b, p)
    B = np.random.randn(4, 5, 3).astype(np.float32)

    out = Blas.mulTensorBatch(gpuarray.to_gpu(A), gpuarray.to_gpu(B), formatA="gbp", formatB="gbp", formatOut="gbp")
    assert np.allclose(out.get(), np.einsum("gbp,gpq->gbq", A, B), atol=1e-5)

    # bgp layout
    Ab = np.moveaxis(A, 0, 1).copy()
    outb = Blas.mulTensorBatch(gpuarray.to_gpu(Ab), gpuarray.to_gpu(B), formatA="bgp", formatB="gbp", formatOut="bgp")
    assert np.allclose(np.moveaxis(outb.get(), 1, 0), np.einsum("gbp,gpq->gbq", A, B), atol=1e-5)


def testSumOnMatrix():
    A = np.random.randn(5, 7).astype(np.float32)

    out = Blas.sumOnMatrix(gpuarray.to_gpu(A))
    assert np.allclose(out.get(), A.sum(axis=0), atol=1e-5)

    out = Blas.sumOnMatrix(gpuarray.to_gpu(A), cols=False)
    assert np.allclose(out.get(), A.sum(axis=1), atol=1e-5)


def testDotL1():
    x = np.random.randn(64).astype(np.float32)
    y = np.random.randn(64).astype(np.float32)

    assert np.isclose(Blas.dot(gpuarray.to_gpu(x), gpuarray.to_gpu(y)).get(), x @ y, atol=1e-4)
    assert np.isclose(Blas.vectorL1Norm(gpuarray.to_gpu(x)).get(), np.abs(x).sum(), atol=1e-4)


def testAddVecToMat():
    m = np.random.randn(4, 6).astype(np.float32)
    v = np.random.randn(6).astype(np.float32)

    out = MatVec.addVecToMat(gpuarray.to_gpu(v), gpuarray.to_gpu(m), axis=1)
    assert np.allclose(out.get(), m + v[None, :], atol=1e-6)

    v0 = np.random.randn(4).astype(np.float32)
    out = MatVec.addVecToMat(gpuarray.to_gpu(v0), gpuarray.to_gpu(m), axis=0)
    assert np.allclose(out.get(), m + v0[:, None], atol=1e-6)


def _refConv2d(x, w, stride, pad, dilation):
    n, cin, h, wd = x.shape
    cout, _, kh, kw = w.shape

    oh = (h + 2 * pad - dilation * (kh - 1) - 1) // stride + 1
    ow = (wd + 2 * pad - dilation * (kw - 1) - 1) // stride + 1

    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    out = np.zeros((n, cout, oh, ow), np.float32)

    for i in range(oh):
        for j in range(ow):
            patch = xp[:, :, i * stride:i * stride + dilation * (kh - 1) + 1:dilation,
                       j * stride:j * stride + dilation * (kw - 1) + 1:dilation]
            out[:, :, i, j] = np.einsum("nchw,ochw->no", patch, w)

    return out


@pytest.mark.parametrize("stride,pad,dilation", [(1, 0, 1), (2, 1, 1), (1, 2, 2)])
def testConv2d(stride, pad, dilation):
    x = np.random.randn(2, 3, 8, 8).astype(np.float32)
    w = np.random.randn(4, 3, 3, 3).astype(np.float32)
    b = np.random.randn(1, 4, 1, 1).astype(np.float32)

    out = Dnn.convNd(gpuarray.to_gpu(x), gpuarray.to_gpu(w), gpuarray.to_gpu(b),
                     (stride, stride), (pad, pad), (dilation, dilation), 1)

    ref = _refConv2d(x, w, stride, pad, dilation) + b
    assert np.allclose(out.get(), ref, atol=1e-4)


def testConvBackwardFiniteDiff():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, 5, 5).astype(np.float32)
    w = rng.randn(3, 2, 3, 3).astype(np.float32)
    grad = rng.randn(2, 3, 5, 5).astype(np.float32)

    stride, pad, dilation = (1, 1), (1, 1), (1, 1)

    dx = Dnn.convNdBackwardData(gpuarray.to_gpu(grad), gpuarray.to_gpu(w), gpuarray.to_gpu(x),
                                stride, pad, dilation, 1).get()
    dwOut = Dnn.convNdBackwardParams(gpuarray.to_gpu(x), gpuarray.to_gpu(grad), gpuarray.to_gpu(w), None,
                                     stride, pad, dilation, 1)
    dw = dwOut.get()

    def loss(xx, ww):
        return float((_refConv2d(xx, ww, 1, 1, 1) * grad).sum())

    eps = 1e-2
    for idx in [(0, 0, 2, 2), (1, 1, 4, 0)]:
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        assert np.isclose((loss(xp, w) - loss(xm, w)) / (2 * eps), dx[idx], atol=1e-2)

    for idx in [(0, 0, 1, 1), (2, 1, 0, 2)]:
        wp = w.copy(); wp[idx] += eps
        wm = w.copy(); wm[idx] -= eps
        assert np.isclose((loss(x, wp) - loss(x, wm)) / (2 * eps), dw[idx], atol=1e-2)


def testGroupedConv():
    x = np.random.randn(2, 4, 6, 6).astype(np.float32)
    w = np.random.randn(6, 2, 3, 3).astype(np.float32)  # groups=2: 4 in, 6 out

    out = Dnn.convNd(gpuarray.to_gpu(x), gpuarray.to_gpu(w), None, (1, 1), (1, 1), (1, 1), 2)

    ref = np.concatenate([
        _refConv2d(x[:, :2], w[:3], 1, 1, 1),
        _refConv2d(x[:, 2:], w[3:], 1, 1, 1),
    ], axis=1)
    assert np.allclose(out.get(), ref, atol=1e-4)


def testDeconv2d():
    x = np.random.randn(2, 3, 4, 4).astype(np.float32)
    w = np.random.randn(3, 5, 3, 3).astype(np.float32)  # (inmaps, outmaps, kh, kw)

    out = Dnn.deconvNd(gpuarray.to_gpu(x), gpuarray.to_gpu(w), None, (2, 2), (1, 1), (1, 1), (0, 0), 1)
    assert out.shape == (2, 5, 7, 7)

    # adjointness: <deconv(x), g> == <x, conv(g)>
    g = np.random.randn(*out.shape).astype(np.float32)
    conv_g = Dnn.deconvNdBackwardData(gpuarray.to_gpu(g), gpuarray.to_gpu(w), None, (2, 2), (1, 1), (1, 1), 1)

    assert np.isclose((out.get() * g).sum(), (x * conv_g.get()).sum(), rtol=1e-3)


def testPool():
    x = np.random.randn(2, 3, 6, 6).astype(np.float32)

    out, _ = Dnn.poolNd(gpuarray.to_gpu(x), (2, 2), (2, 2), (0, 0), Dnn.PoolMode.max)
    ref = x.reshape(2, 3, 3, 2, 3, 2).max(axis=(3, 5))
    assert np.allclose(out.get(), ref)

    outAvg, _ = Dnn.poolNd(gpuarray.to_gpu(x), (2, 2), (2, 2), (0, 0), Dnn.PoolMode.avgWithPad)
    refAvg = x.reshape(2, 3, 3, 2, 3, 2).mean(axis=(3, 5))
    assert np.allclose(outAvg.get(), refAvg, atol=1e-6)

    # max pool backward routes grad to argmax
    grad = np.random.randn(2, 3, 3, 3).astype(np.float32)
    ingrad = Dnn.poolNdBackward(gpuarray.to_gpu(x), None, gpuarray.to_gpu(grad), None,
                                (2, 2), (2, 2), (0, 0), Dnn.PoolMode.max)
    assert np.isclose(ingrad.get().sum(), grad.sum(), atol=1e-4)
    assert np.count_nonzero(ingrad.get()) == grad.size


def testBatchNorm():
    x = np.random.randn(8, 4, 5, 5).astype(np.float32)
    shape = (1, 4, 1, 1)

    scale = gpuarray.to_gpu(np.random.rand(*shape).astype(np.float32) + 0.5)
    bias = gpuarray.to_gpu(np.random.randn(*shape).astype(np.float32))
    mean = gpuarray.zeros(shape, np.float32)
    var = gpuarray.to_gpu(np.ones(shape, np.float32))

    out, savemean, saveinvvar = Dnn.batchNormNd(gpuarray.to_gpu(x), scale, bias, mean, var, 1e-5, 0.1, False)

    bm = x.mean(axis=(0, 2, 3))
    bv = x.var(axis=(0, 2, 3))
    ref = (x - bm[None, :, None, None]) / np.sqrt(bv[None, :, None, None] + 1e-5) \
        * scale.get() + bias.get()

    assert np.allclose(out.get(), ref, atol=1e-4)
    assert np.allclose(savemean.get().ravel(), bm, atol=1e-5)

    # running stats updated in place (unbiased variance enters the running buffer)
    n = 8 * 25
    assert np.allclose(mean.get().ravel(), 0.1 * bm, atol=1e-5)
    assert np.allclose(var.get().ravel(), 0.9 * 1.0 + 0.1 * bv * n / (n - 1), atol=1e-4)

    # test mode uses running stats
    outTest = Dnn.batchNormNd(gpuarray.to_gpu(x), scale, bias, mean, var, 1e-5, 0.1, True)
    refTest = (x - mean.get()) / np.sqrt(var.get() + 1e-5) * scale.get() + bias.get()
    assert np.allclose(outTest.get(), refTest, atol=1e-4)


def testBatchNormBackwardFiniteDiff():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 3, 2, 2).astype(np.float32)
    scale = (rng.rand(1, 3, 1, 1).astype(np.float32) + 0.5)
    bias = rng.randn(1, 3, 1, 1).astype(np.float32)
    grad = rng.randn(4, 3, 2, 2).astype(np.float32)

    mean = gpuarray.zeros((1, 3, 1, 1), np.float32)
    var = gpuarray.to_gpu(np.ones((1, 3, 1, 1), np.float32))

    _, savemean, saveinvvar = Dnn.batchNormNd(
        gpuarray.to_gpu(x), gpuarray.to_gpu(scale), gpuarray.to_gpu(bias), mean, var, 1e-5, 0.0, False
    )

    dx, dscale, dbias = Dnn.batchNormNdBackward(
        gpuarray.to_gpu(x), gpuarray.to_gpu(grad), gpuarray.to_gpu(scale), savemean, saveinvvar, 1e-5
    )

    def loss(xx, ss, bb):
        bm = xx.mean(axis=(0, 2, 3), keepdims=True)
        bv = xx.var(axis=(0, 2, 3), keepdims=True)
        out = (xx - bm) / np.sqrt(bv + 1e-5) * ss + bb
        return float((out * grad).sum())

    eps = 1e-3
    for idx in [(0, 0, 0, 0), (2, 1, 1, 0), (3, 2, 0, 1)]:
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        assert np.isclose((loss(xp, scale, bias) - loss(xm, scale, bias)) / (2 * eps), dx.get()[idx], atol=1e-2)

    for c in range(3):
        sp = scale.copy(); sp[0, c] += eps
        sm = scale.copy(); sm[0, c] -= eps
        assert np.isclose((loss(x, sp, bias) - loss(x, sm, bias)) / (2 * eps), dscale.get()[0, c, 0, 0], atol=1e-2)

    assert np.allclose(dbias.get().ravel(), grad.sum(axis=(0, 2, 3)), atol=1e-4)


def testSoftmax():
    x = np.random.randn(4, 7, 2, 2).astype(np.float32)

    out = Dnn.softmaxNd(gpuarray.to_gpu(x))

    e = np.exp(x - x.max(axis=1, keepdims=True))
    ref = e / e.sum(axis=1, keepdims=True)
    assert np.allclose(out.get(), ref, atol=1e-5)

    grad = np.random.randn(*x.shape).astype(np.float32)
    ingrad = Dnn.softmaxNdBackward(out, gpuarray.to_gpu(grad))

    refGrad = ref * (grad - (grad * ref).sum(axis=1, keepdims=True))
    assert np.allclose(ingrad.get(), refGrad, atol=1e-5)


def testCrossEntropyKernel():
    scores = np.random.randn(20, 10, 3).astype(np.float32)
    labels = np.random.randint(0, 10, size=(20, 3)).astype(np.int32)

    err, grad = Costs.crossEntropyKernel(gpuarray.to_gpu(scores), gpuarray.to_gpu(labels))

    e = np.exp(scores - scores.max(axis=1, keepdims=True))
    smax = e / e.sum(axis=1, keepdims=True)

    onehot = (labels[:, None, :] == np.arange(10)[None, :, None])
    refGrad = (onehot - smax) / 20

    assert np.allclose(grad.get(), refGrad, atol=1e-5)

    refErr = -np.log(smax[onehot]).sum() / 3
    assert np.isclose(err.get() / 20, refErr / 20, rtol=1e-4)


def testCrossMapLRN():
    x = np.random.randn(2, 8, 4, 4).astype(np.float32)
    N, alpha, beta, K = 5, 1e-4, 0.75, 2.0

    out, _ = Dnn.crossMapLRN(gpuarray.to_gpu(x), N, alpha, beta, K)

    ref = np.zeros_like(x)
    half = N // 2
    for c in range(8):
        lo, hi = max(0, c - half), min(8, c + half + 1)
        s = (x[:, lo:hi] ** 2).sum(axis=1)
        ref[:, c] = x[:, c] / (K + alpha / N * s) ** beta

    assert np.allclose(out.get(), ref, atol=1e-5)


def testMemoryOps():
    x = np.random.randn(2, 3, 4, 5).astype(np.float32)
    dev = gpuarray.to_gpu(x)

    assert np.allclose(Memory.moveaxis(dev, 1, 3).get(), np.moveaxis(x, 1, 3))
    assert np.allclose(Memory.swapaxes(dev, 0, 2).get(), np.swapaxes(x, 0, 2))
    assert np.allclose(Memory.transpose(dev, (3, 1, 0, 2)).get(), np.transpose(x, (3, 1, 0, 2)))


def testDepthConcat():
    a = np.random.randn(2, 3, 5, 5).astype(np.float32)
    b = np.random.randn(2, 2, 3, 3).astype(np.float32)

    out = Memory.depthConcat([gpuarray.to_gpu(a), gpuarray.to_gpu(b)])
    assert out.shape == (2, 5, 5, 5)
    assert np.allclose(out.get()[:, :3], a)
    assert np.allclose(out.get()[:, 3:, 1:4, 1:4], b)

    grads = Memory.depthSplit(out, [gpuarray.to_gpu(a), gpuarray.to_gpu(b)])
    assert np.allclose(grads[0].get(), a) and np.allclose(grads[1].get(), b)


def testConvBackwardExactOracle():
    """conv bwd-data / bwd-filter against exact float64 loop oracles at the
    BASELINE 1e-4 tolerance (finite differences above only reach ~1e-2)."""
    np.random.seed(40)

    n, c, h, w = 2, 3, 8, 9
    co, kh, kw = 4, 3, 3
    stride, pad = (2, 1), (1, 1)

    x = np.random.randn(n, c, h, w).astype(np.float32)
    W = np.random.randn(co, c, kh, kw).astype(np.float32)

    oh = (h + 2 * pad[0] - kh) // stride[0] + 1
    ow = (w + 2 * pad[1] - kw) // stride[1] + 1
    grad = np.random.randn(n, co, oh, ow).astype(np.float32)

    x64 = np.pad(x.astype(np.float64), ((0, 0), (0, 0), (pad[0], pad[0]), (pad[1], pad[1])))
    W64, g64 = W.astype(np.float64), grad.astype(np.float64)

    dxPad = np.zeros_like(x64)
    dW = np.zeros_like(W64)

    for oy in range(oh):
        for ox in range(ow):
            patch = x64[:, :, oy * stride[0]:oy * stride[0] + kh, ox * stride[1]:ox * stride[1] + kw]
            go = g64[:, :, oy, ox]                           # (n, co)
            dxPad[:, :, oy * stride[0]:oy * stride[0] + kh,
                  ox * stride[1]:ox * stride[1] + kw] += np.einsum("no,ochw->nchw", go, W64)
            dW += np.einsum("no,nchw->ochw", go, patch)

    dxRef = dxPad[:, :, pad[0]:pad[0] + h, pad[1]:pad[1] + w]

    dx = Dnn.convNdBackwardData(gpuarray.to_gpu(grad), gpuarray.to_gpu(W), gpuarray.to_gpu(x),
                                stride, pad, (1, 1), 1)
    dwOut = Dnn.convNdBackwardParams(gpuarray.to_gpu(x), gpuarray.to_gpu(grad), gpuarray.to_gpu(W),
                                     None, stride, pad, (1, 1), 1)

    assert np.abs(dx.get() - dxRef).max() < 1e-4
    assert np.abs(dwOut.get() - dW).max() < 1e-4


def testPoolBackwardExactOracle():
    """max/avg pool backward against float64 scatter oracles at 1e-4."""
    np.random.seed(41)

    n, c, h, w = 2, 3, 7, 8
    size, stride, pad = (2, 2), (2, 2), (0, 0)

    x = np.random.randn(n, c, h, w).astype(np.float32)
    oh, ow = (h - size[0]) // stride[0] + 1, (w - size[1]) // stride[1] + 1
    grad = np.random.randn(n, c, oh, ow).astype(np.float32)

    x64, g64 = x.astype(np.float64), grad.astype(np.float64)

    dxMax = np.zeros_like(x64)
    dxAvg = np.zeros_like(x64)

    for oy in range(oh):
        for ox in range(ow):
            win = x64[:, :, oy * 2:oy * 2 + 2, ox * 2:ox * 2 + 2].reshape(n, c, 4)
            arg = win.argmax(axis=2)
            for i in range(n):
                for j in range(c):
                    dy, dx_ = divmod(arg[i, j], 2)
                    dxMax[i, j, oy * 2 + dy, ox * 2 + dx_] += g64[i, j, oy, ox]
            dxAvg[:, :, oy * 2:oy * 2 + 2, ox * 2:ox * 2 + 2] += g64[:, :, oy, ox, None, None] / 4.0

    gMax = Dnn.poolNdBackward(gpuarray.to_gpu(x), None, gpuarray.to_gpu(grad), None,
                              size, stride, pad, mode=Dnn.PoolMode.max)
    gAvg = Dnn.poolNdBackward(gpuarray.to_gpu(x), None, gpuarray.to_gpu(grad), None,
                              size, stride, pad, mode=Dnn.PoolMode.avgWithPad)

    assert np.abs(gMax.get() - dxMax).max() < 1e-4
    assert np.abs(gAvg.get() - dxAvg).max() < 1e-4


def testBatchNormBackwardExactOracle():
    """spatial batch-norm backward against the closed-form float64 oracle at 1e-4."""
    np.random.seed(42)

    n, c, h, w = 3, 4, 5, 5
    eps = 1e-5

    x = np.random.randn(n, c, h, w).astype(np.float32)
    grad = np.random.randn(n, c, h, w).astype(np.float32)
    scaleH = np.random.rand(c).astype(np.float32) + 0.5

    shape = (1, c, 1, 1)
    scale = gpuarray.to_gpu(scaleH.reshape(shape))
    bias = gpuarray.to_gpu(np.zeros(shape, np.float32))
    mean = gpuarray.to_gpu(np.zeros(shape, np.float32))
    var = gpuarray.to_gpu(np.ones(shape, np.float32))

    out, savemean, saveinvvar = Dnn.batchNormNd(gpuarray.to_gpu(x), scale, bias, mean, var,
                                                eps, 0.1, False)

    dx, dscale, dbias = Dnn.batchNormNdBackward(gpuarray.to_gpu(x), gpuarray.to_gpu(grad),
                                                scale, savemean, saveinvvar, eps)

    x64, g64 = x.astype(np.float64), grad.astype(np.float64)
    m = x64.mean(axis=(0, 2, 3))
    v = x64.var(axis=(0, 2, 3))
    inv = 1.0 / np.sqrt(v + eps)
    xhat = (x64 - m[None, :, None, None]) * inv[None, :, None, None]

    N = n * h * w
    dsc = (g64 * xhat).sum(axis=(0, 2, 3))
    dbi = g64.sum(axis=(0, 2, 3))
    dxRef = (scaleH.astype(np.float64) * inv)[None, :, None, None] / N * (
        N * g64 - dbi[None, :, None, None] - xhat * dsc[None, :, None, None]
    )

    assert np.abs(dx.get() - dxRef).max() < 1e-4
    assert np.abs(dscale.get().ravel() - dsc).max() < 1e-4
    assert np.abs(dbias.get().ravel() - dbi).max() < 1e-4


def testGroupedConvBackwardData():
    """Grouped bwd-data (single feature_group_count conv) against the
    jax.vjp of the grouped forward."""
    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu.ops import conv as opsconv

    np.random.seed(43)

    n, cin, h, w_, co, k, groups = 2, 6, 9, 9, 8, 3, 2
    stride, pad = (2, 1), (1, 1)

    x = np.random.randn(n, cin, h, w_).astype(np.float32)
    W = np.random.randn(co, cin // groups, k, k).astype(np.float32)

    out = opsconv.convNd(jnp.asarray(x), jnp.asarray(W), None, stride, pad, (1, 1), groups)
    grad = np.random.randn(*out.shape).astype(np.float32)

    dx = opsconv.convNdBackwardData(jnp.asarray(grad), jnp.asarray(W), x.shape,
                                    stride, pad, (1, 1), groups)

    _, vjp = jax.vjp(
        lambda xx: opsconv.convNd(xx, jnp.asarray(W), None, stride, pad, (1, 1), groups),
        jnp.asarray(x))
    dxRef, = vjp(jnp.asarray(grad))

    assert np.allclose(np.asarray(dx), np.asarray(dxRef), atol=1e-4)

    # depthwise extreme: groups == channels
    cin2 = 4
    x2 = np.random.randn(n, cin2, 8, 8).astype(np.float32)
    W2 = np.random.randn(cin2, 1, 3, 3).astype(np.float32)

    out2 = opsconv.convNd(jnp.asarray(x2), jnp.asarray(W2), None, (1, 1), (1, 1), (1, 1), cin2)
    g2 = np.random.randn(*out2.shape).astype(np.float32)

    dx2 = opsconv.convNdBackwardData(jnp.asarray(g2), jnp.asarray(W2), x2.shape,
                                     (1, 1), (1, 1), (1, 1), cin2)
    _, vjp2 = jax.vjp(
        lambda xx: opsconv.convNd(xx, jnp.asarray(W2), None, (1, 1), (1, 1), (1, 1), cin2),
        jnp.asarray(x2))
    dx2Ref, = vjp2(jnp.asarray(g2))

    assert np.allclose(np.asarray(dx2), np.asarray(dx2Ref), atol=1e-4)
