import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray


def testGroupLinear():
    from puzzlelib_tpu.modules import GroupLinear

    np.random.seed(0)
    groups, batch, insize, outsize = 3, 4, 5, 6

    mod = GroupLinear(groups, insize, outsize)

    data = np.random.randn(batch, groups, insize).astype(np.float32)
    out = mod(gpuarray.to_gpu(data))
    assert out.shape == (batch, groups, outsize)

    W = mod.W.get()
    expected = np.einsum("bgi,gio->bgo", data, W) + mod.b.get()[None]
    assert np.allclose(out.get(), expected, atol=1e-4)

    grad = np.random.randn(batch, groups, outsize).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    assert np.allclose(mod.grad.get(), np.einsum("bgo,gio->bgi", grad, W), atol=1e-4)
    assert np.allclose(mod.vars["W"].grad.get(), np.einsum("bgi,bgo->gio", data, grad), atol=1e-4)
    assert np.allclose(mod.vars["b"].grad.get(), grad.sum(axis=0), atol=1e-4)


def testSumModule():
    from puzzlelib_tpu.modules import Sum

    np.random.seed(1)
    batchsize, groups, size = 5, 3, 4

    data = np.random.randn(batchsize, groups, size).astype(np.float32)

    summod = Sum(axis=1, useWeights=False)
    summod(gpuarray.to_gpu(data))
    assert np.allclose(summod.data.get(), data.sum(axis=1), atol=1e-5)

    grad = np.random.randn(batchsize, size).astype(np.float32)
    summod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(summod.grad.get(), np.repeat(grad[:, None], groups, axis=1), atol=1e-5)

    weights = np.random.randn(batchsize, groups).astype(np.float32)

    summod = Sum(axis=1, useWeights=True)
    summod([gpuarray.to_gpu(data), gpuarray.to_gpu(weights)])
    assert np.allclose(summod.data.get(), (data * weights[..., None]).sum(axis=1), atol=1e-5)

    summod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(summod.grad[0].get(), np.repeat(grad[:, None], groups, axis=1) * weights[..., None],
                       atol=1e-5)
    assert np.allclose(summod.grad[1].get(), (data * grad[:, None]).sum(axis=2), atol=1e-5)


def testPRelu():
    from puzzlelib_tpu.modules import PRelu

    np.random.seed(2)
    mod = PRelu(maps=3)

    data = np.random.randn(2, 3, 4, 4).astype(np.float32)
    out = mod(gpuarray.to_gpu(data))

    slopes = mod.slopes.get()
    expected = np.where(data > 0, data, data * slopes[None, :, None, None])
    assert np.allclose(out.get(), expected, atol=1e-5)

    grad = np.random.randn(*data.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    expectedGrad = grad * np.where(data > 0, 1.0, slopes[None, :, None, None])
    assert np.allclose(mod.grad.get(), expectedGrad, atol=1e-5)

    expectedSlopes = np.where(data > 0, 0.0, data * grad).sum(axis=(0, 2, 3))
    assert np.allclose(mod.vars["slopes"].grad.get(), expectedSlopes, atol=1e-4)


def testEmbedder():
    from puzzlelib_tpu.modules import Embedder

    np.random.seed(3)
    mod = Embedder(10, 5, 8, initscheme="uniform")

    data = np.random.randint(0, 10, size=(3, 5)).astype(np.int32)
    out = mod(gpuarray.to_gpu(data))

    W = mod.W.get()
    assert np.allclose(out.get(), W[data], atol=1e-6)

    grad = np.random.randn(3, 5, 8).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    expected = np.zeros_like(W)
    for i in range(3):
        for j in range(5):
            expected[data[i, j]] += grad[i, j]

    assert np.allclose(mod.vars["W"].grad.get(), expected, atol=1e-4)


def testUpsample2D():
    from puzzlelib_tpu.modules import Upsample2D

    np.random.seed(4)
    data = np.random.randn(2, 3, 4, 4).astype(np.float32)

    mod = Upsample2D(scale=2, mode="nearest")
    out = mod(gpuarray.to_gpu(data))

    expected = data.repeat(2, axis=2).repeat(2, axis=3)
    assert np.allclose(out.get(), expected)

    grad = np.random.randn(2, 3, 8, 8).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    expectedGrad = grad.reshape(2, 3, 4, 2, 4, 2).sum(axis=(3, 5))
    assert np.allclose(mod.grad.get(), expectedGrad, atol=1e-5)

    # linear mode: adjoint consistency <up(x), g> == <x, upT(g)>
    mod = Upsample2D(scale=2, mode="linear")
    out = mod(gpuarray.to_gpu(data))
    mod.backward(gpuarray.to_gpu(grad))

    assert np.isclose((out.get() * grad).sum(), (data * mod.grad.get()).sum(), rtol=1e-3)


def testPadReflect():
    from puzzlelib_tpu.modules import Pad1D, Pad2D

    np.random.seed(5)

    data = np.random.randn(2, 3, 6).astype(np.float32)
    mod = Pad1D(2, mode="reflect")
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), np.pad(data, ((0, 0), (0, 0), (2, 2)), mode="reflect"))

    grad = np.random.randn(2, 3, 10).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.isclose((out.get() * grad).sum(), (data * mod.grad.get()).sum(), rtol=1e-4)

    data2 = np.random.randn(2, 3, 5, 5).astype(np.float32)
    mod2 = Pad2D((1, 1, 2, 2), mode="reflect")
    out2 = mod2(gpuarray.to_gpu(data2))
    assert np.allclose(out2.get(), np.pad(data2, ((0, 0), (0, 0), (1, 1), (2, 2)), mode="reflect"))

    # constant mode
    mod3 = Pad2D(1, mode="constant", fillValue=7.0)
    out3 = mod3(gpuarray.to_gpu(data2))
    assert out3.shape == (2, 3, 7, 7)
    assert np.allclose(out3.get()[:, :, 0, :], 7.0)
    assert np.allclose(out3.get()[:, :, 1:6, 1:6], data2)


def testKMaxPool():
    from puzzlelib_tpu.modules import KMaxPool

    np.random.seed(6)
    data = np.random.randn(3, 7, 5).astype(np.float32)

    mod = KMaxPool(topk=3, axis=1)
    out = mod(gpuarray.to_gpu(data))

    expected = np.sort(np.partition(data, -3, axis=1)[:, -3:], axis=1)
    assert np.allclose(out.get(), expected, atol=1e-6)

    grad = np.random.randn(3, 3, 5).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert mod.grad.shape == data.shape
    assert np.isclose(mod.grad.get().sum(), grad.sum(), atol=1e-4)


def testInstanceNorm2D():
    from puzzlelib_tpu.modules import InstanceNorm2D

    np.random.seed(7)
    data = np.random.randn(2, 3, 5, 5).astype(np.float32)

    mod = InstanceNorm2D(3)
    out = mod(gpuarray.to_gpu(data))

    mean = data.mean(axis=(2, 3), keepdims=True)
    var = data.var(axis=(2, 3), keepdims=True)
    expected = (data - mean) / np.sqrt(var + 1e-5)

    assert np.allclose(out.get(), expected, atol=1e-4)

    grad = np.random.randn(*data.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert mod.grad.shape == data.shape


def testMaxPoolMaskUnpool():
    from puzzlelib_tpu.modules import MaxPool2D, MaxUnpool2D

    np.random.seed(8)
    data = np.random.randn(2, 3, 8, 8).astype(np.float32)

    pool = MaxPool2D(useMask=True)
    unpool = MaxUnpool2D(pool)

    pooled = pool(gpuarray.to_gpu(data))
    assert np.allclose(pooled.get(), data.reshape(2, 3, 4, 2, 4, 2).max(axis=(3, 5)))

    unpooled = unpool(pooled)
    assert unpooled.shape == data.shape

    # each pooled max lands back at its argmax position
    assert np.allclose(np.sort(unpooled.get()[unpooled.get() != 0]), np.sort(pooled.get().ravel()))

    grad = np.random.randn(*data.shape).astype(np.float32)
    unpool.backward(gpuarray.to_gpu(grad))
    assert unpool.grad.shape == pooled.shape


def testSpatialTfIdentity():
    from puzzlelib_tpu.modules import SpatialTf

    np.random.seed(9)
    data = np.random.randn(2, 3, 6, 6).astype(np.float32)

    theta = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))

    mod = SpatialTf()
    out = mod([gpuarray.to_gpu(data), gpuarray.to_gpu(theta)])

    assert np.allclose(out.get(), data, atol=1e-4)

    grad = np.random.randn(*data.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    dx, dtheta = mod.grad
    assert dx.shape == data.shape and dtheta.shape == (2, 2, 3)


def testDropoutScaling():
    from puzzlelib_tpu.modules import Dropout

    np.random.seed(10)
    data = np.ones((512, 64), np.float32)

    mod = Dropout(p=0.3)
    out = mod(gpuarray.to_gpu(data))

    vals = out.get()
    kept = vals != 0

    assert np.allclose(vals[kept], 1.0 / 0.7, atol=1e-5)
    assert abs(kept.mean() - 0.7) < 0.05

    # backward applies the same mask
    grad = np.ones_like(data)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.array_equal(mod.grad.get() != 0, kept)

    # eval mode is identity
    mod.evalMode()
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), data)


def testLCNAndSubtractMean():
    from puzzlelib_tpu.modules import LCN, SubtractMean

    np.random.seed(11)
    data = np.random.randn(2, 3, 9, 9).astype(np.float32)

    sub = SubtractMean(size=5)
    out = sub(gpuarray.to_gpu(data))
    assert out.shape == data.shape

    grad = np.random.randn(*data.shape).astype(np.float32)
    sub.backward(gpuarray.to_gpu(grad))
    assert np.isclose((out.get() * grad).sum(), (data * sub.grad.get()).sum(), rtol=1e-3)

    lcn = LCN(N=5)
    out = lcn(gpuarray.to_gpu(data))
    assert out.shape == data.shape

    lcn.backward(gpuarray.to_gpu(grad))
    assert np.isclose((out.get() * grad).sum(), (data * lcn.grad.get()).sum(), rtol=1e-3)


def testGeluModule():
    from puzzlelib_tpu.modules import Gelu

    np.random.seed(12)
    data = np.random.randn(4, 16).astype(np.float32)

    mod = Gelu()
    out = mod(gpuarray.to_gpu(data))

    expected = 0.5 * data * (1.0 + np.tanh(0.7978845608 * (data + 0.044715 * data ** 3)))
    # TPU tier: the VPU tanh is a polynomial approximation (measured up to
    # ~3e-5 abs error on v5e against IEEE tanh)
    import jax
    atol = 1e-5 if jax.devices()[0].platform == "cpu" else 1e-4
    assert np.allclose(out.get(), expected, atol=atol)

    # finite-difference check of the derivative
    grad = np.random.randn(*data.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    h = 1e-3
    idx = (1, 3)

    dp = data.copy(); dp[idx] += h
    dm = data.copy(); dm[idx] -= h

    gp = 0.5 * dp * (1.0 + np.tanh(0.7978845608 * (dp + 0.044715 * dp ** 3)))
    gm = 0.5 * dm * (1.0 + np.tanh(0.7978845608 * (dm + 0.044715 * dm ** 3)))

    fd = (gp[idx] - gm[idx]) / (2 * h) * grad[idx]
    assert np.isclose(mod.grad.get()[idx], fd, atol=1e-3)


def testMapLRN():
    from puzzlelib_tpu.modules import MapLRN

    np.random.seed(13)
    data = np.random.randn(2, 2, 7, 7).astype(np.float32)

    mod = MapLRN(N=3)
    out = mod(gpuarray.to_gpu(data))
    assert out.shape == data.shape

    grad = np.random.randn(*data.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert mod.grad.shape == data.shape


def testNoiseInjector():
    from puzzlelib_tpu.modules import NoiseInjector

    np.random.seed(14)
    data = np.random.randn(4, 6).astype(np.float32)

    # additive uniform noise: out - in must equal the recorded noise buffer,
    # bounded by the uniform range (reference /root/reference/Modules/NoiseInjector.py)
    mod = NoiseInjector(mode="add", noisetype="uniform", params=(-0.5, 0.5))
    out = mod(gpuarray.to_gpu(data))
    noise = out.get() - data
    assert np.allclose(noise, mod.rands.get(), atol=1e-6)
    assert noise.min() >= -0.5 - 1e-6 and noise.max() <= 0.5 + 1e-6
    assert not np.allclose(noise, 0.0)

    # additive backward: gradient passes through unchanged
    grad = np.random.randn(4, 6).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), grad, atol=1e-6)

    # multiplicative gaussian: out = in * rands; backward scales by the
    # SAME noise realization
    mod = NoiseInjector(mode="mul", noisetype="gaussian", params=(1.0, 0.1))
    out = mod(gpuarray.to_gpu(data))
    rands = mod.rands.get()
    assert np.allclose(out.get(), data * rands, atol=1e-5)

    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), grad * rands, atol=1e-5)

    # eval mode: identity passthrough, no noise drawn
    mod = NoiseInjector(mode="add")
    mod.evalMode()
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), data, atol=0)
    assert mod.rands is None


def testPenalty():
    from puzzlelib_tpu.modules import Penalty

    np.random.seed(15)
    batch = 10
    data = np.random.randn(batch, 8).astype(np.float32)
    grad = np.random.randn(batch, 8).astype(np.float32)

    # forward is identity for both modes
    # l1: grad - w/batch * sign(data)   (reference Modules/Penalty.py:33-36,
    # sign(0) = +1 per the kernel's where(data >= 0))
    weight = 1e-2
    mod = Penalty(mode="l1", weight=weight)
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), data, atol=0)

    mod.backward(gpuarray.to_gpu(grad))
    expected = grad - weight / batch * np.where(data >= 0, 1.0, -1.0).astype(np.float32)
    assert np.allclose(mod.grad.get(), expected, atol=1e-6)

    # l2: grad - w/batch * data          (reference Modules/Penalty.py:38-41)
    mod = Penalty(mode="l2", weight=weight)
    mod(gpuarray.to_gpu(data))
    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), grad - weight / batch * data, atol=1e-6)


def testGlue():
    from puzzlelib_tpu.modules import Glue, Linear
    from puzzlelib_tpu.modules.module import ModuleError

    np.random.seed(16)
    data = np.random.randn(3, 5).astype(np.float32)

    # hooks see the raw data plus the module dictionary and drive any
    # modules themselves (reference Modules/Glue.py contract)
    inner = Linear(5, 4)

    def fwdGlue(d, modules):
        return modules["lin"](d)

    def bwdGlue(g, modules):
        modules["lin"].backward(g)
        return modules["lin"].grad

    mod = Glue(modules={"lin": inner}, fwdGlue=fwdGlue, bwdGlue=bwdGlue,
               fwdShapeGlue=lambda s: (s[0], 4), bwdShapeGlue=lambda s: (s[0], 5))

    out = mod(gpuarray.to_gpu(data))
    expected = data @ inner.W.get() + inner.b.get()[None]
    assert np.allclose(out.get(), expected, atol=1e-5)

    grad = np.random.randn(3, 4).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), grad @ inner.W.get().T, atol=1e-5)

    assert mod.dataShapeFrom((3, 5)) == (3, 4)
    assert mod.gradShapeFrom((3, 4)) == (3, 5)

    # missing shape hooks raise ModuleError, like the reference
    bare = Glue(fwdGlue=lambda d, m: d, bwdGlue=lambda g, m: g)
    with pytest.raises(ModuleError):
        bare.dataShapeFrom((3, 5))
    with pytest.raises(ModuleError):
        bare.gradShapeFrom((3, 5))


def testToList():
    from puzzlelib_tpu.modules import ToList

    np.random.seed(17)
    a = np.random.randn(2, 3).astype(np.float32)
    b = np.random.randn(2, 4).astype(np.float32)
    c = np.random.randn(2, 5).astype(np.float32)

    mod = ToList()
    nested = [gpuarray.to_gpu(a), [gpuarray.to_gpu(b), [gpuarray.to_gpu(c)]]]
    out = mod(nested)

    # forward flattens depth-first into one list
    assert isinstance(out, list) and len(out) == 3
    assert np.allclose(out[0].get(), a) and np.allclose(out[1].get(), b) \
        and np.allclose(out[2].get(), c)

    # backward re-nests the flat gradient list to mirror the input structure
    ga, gb, gc = (np.random.randn(*x.shape).astype(np.float32) for x in (a, b, c))
    mod.backward([gpuarray.to_gpu(ga), gpuarray.to_gpu(gb), gpuarray.to_gpu(gc)])

    grad = mod.grad
    assert np.allclose(grad[0].get(), ga)
    assert np.allclose(grad[1][0].get(), gb)
    assert np.allclose(grad[1][1][0].get(), gc)

    # flat shape accounting matches the leaf order
    shapes = mod.dataShapeFrom([(2, 3), [(2, 4), [(2, 5)]]])
    assert shapes == [(2, 3), (2, 4), (2, 5)]
