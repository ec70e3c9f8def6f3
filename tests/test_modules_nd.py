"""Numeric oracles for the 1D/3D conv/pool/deconv wrappers and the small
memory/elementwise modules that previously had no direct coverage.

Torch CPU (float64 autograd) is the oracle for the learned-parameter modules
— a second, independent implementation of each op's semantics, same protocol
as tests/torchoracle.py; numpy is the oracle for the pure data-movement ones.
Reference contracts: /root/reference/Modules/{ConvND,DeconvND,Pool3D,
BatchNormND,Dropout2D,MulAddConst,MoveAxis,Transpose,Mul,Upsample3D}.py.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from puzzlelib_tpu.backend import gpuarray


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float64), requires_grad=True)


def _check(mod, data, tfwd, tgrads, outgrad, atol=1e-4):
    """Run fwd+bwd through ``mod`` and compare against the torch graph."""
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), tfwd.detach().numpy(), atol=atol), \
        "forward mismatch: max err %g" % np.abs(out.get() - tfwd.detach().numpy()).max()

    tfwd.backward(torch.tensor(np.asarray(outgrad, dtype=np.float64)))
    mod.backward(gpuarray.to_gpu(outgrad))

    for name, leaf in tgrads.items():
        ours = mod.grad.get() if name == "in" else mod.vars[name].grad.get()
        theirs = leaf.grad.numpy()
        assert np.allclose(ours.ravel(), theirs.ravel(), atol=atol), \
            "%s grad mismatch: max err %g" % (name, np.abs(ours.ravel() - theirs.ravel()).max())


def testConv3D():
    from puzzlelib_tpu.modules import Conv3D

    np.random.seed(20)
    mod = Conv3D(2, 3, size=3, stride=2, pad=1)

    data = np.random.randn(2, 2, 6, 7, 8).astype(np.float32)
    x, w, b = _t(data), _t(mod.W.get()), _t(mod.b.get().reshape(-1))

    tout = F.conv3d(x, w, b, stride=2, padding=1)
    grad = np.random.randn(*tout.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x, "W": w, "b": b}, grad)


def testDeconv1D():
    from puzzlelib_tpu.modules import Deconv1D

    np.random.seed(21)
    mod = Deconv1D(3, 2, size=4, stride=2, pad=1)

    data = np.random.randn(2, 3, 9).astype(np.float32)
    x, w, b = _t(data), _t(mod.W.get()), _t(mod.b.get().reshape(-1))

    tout = F.conv_transpose1d(x, w, b, stride=2, padding=1)
    grad = np.random.randn(*tout.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x, "W": w, "b": b}, grad)


def testDeconv3D():
    from puzzlelib_tpu.modules import Deconv3D

    np.random.seed(22)
    mod = Deconv3D(2, 3, size=3, stride=2)

    data = np.random.randn(2, 2, 4, 5, 4).astype(np.float32)
    x, w, b = _t(data), _t(mod.W.get()), _t(mod.b.get().reshape(-1))

    tout = F.conv_transpose3d(x, w, b, stride=2)
    grad = np.random.randn(*tout.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x, "W": w, "b": b}, grad)


def testMaxPool3D():
    from puzzlelib_tpu.modules import MaxPool3D

    np.random.seed(23)
    mod = MaxPool3D(size=2, stride=2)

    data = np.random.randn(2, 3, 4, 6, 8).astype(np.float32)
    x = _t(data)
    tout = F.max_pool3d(x, 2, 2)
    grad = np.random.randn(*tout.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x}, grad)


def testAvgPool3D():
    from puzzlelib_tpu.modules import AvgPool3D

    np.random.seed(24)
    mod = AvgPool3D(size=2, stride=2, pad=1, includePad=True)

    data = np.random.randn(2, 2, 4, 4, 6).astype(np.float32)
    x = _t(data)
    tout = F.avg_pool3d(x, 2, 2, padding=1, count_include_pad=True)
    grad = np.random.randn(*tout.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x}, grad)


def testAvgPool1D():
    from puzzlelib_tpu.modules import AvgPool1D

    np.random.seed(25)
    mod = AvgPool1D(size=3, stride=2, pad=1, includePad=False)

    data = np.random.randn(3, 4, 10).astype(np.float32)
    x = _t(data)
    tout = F.avg_pool1d(x, 3, 2, padding=1, count_include_pad=False)
    grad = np.random.randn(*tout.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x}, grad)


def testBatchNorm3D():
    from puzzlelib_tpu.modules import BatchNorm3D

    np.random.seed(26)
    maps = 3
    mod = BatchNorm3D(maps)

    data = np.random.randn(2, maps, 3, 4, 5).astype(np.float32)
    x = _t(data)
    scale = _t(mod.scale.get().reshape(-1))
    bias = _t(mod.bias.get().reshape(-1))

    tout = F.batch_norm(x, None, None, weight=scale, bias=bias, training=True,
                        eps=mod.epsilon)
    grad = np.random.randn(*data.shape).astype(np.float32)

    _check(mod, data, tout, {"in": x, "scale": scale, "bias": bias}, grad, atol=2e-4)

    # running stats moved toward the batch statistics
    mean = mod.mean.get().reshape(-1)
    batchMean = data.mean(axis=(0, 2, 3, 4))
    assert np.allclose(mean, batchMean, atol=1e-4)


def testDropout2D():
    from puzzlelib_tpu.modules import Dropout2D

    np.random.seed(27)
    p = 0.5
    mod = Dropout2D(p=p)

    data = np.abs(np.random.randn(8, 16, 5, 5)).astype(np.float32) + 0.1
    out = mod(gpuarray.to_gpu(data)).get()

    keep = 1.0 - p
    ratio = out / data                          # either 0 or 1/keep, per MAP
    perMap = ratio.reshape(8, 16, -1)
    assert np.allclose(perMap, perMap[:, :, :1], atol=1e-6), \
        "dropout2d must zero whole maps, not elements"
    kinds = np.unique(np.round(perMap[:, :, 0], 5))
    assert set(kinds) <= {0.0, np.float32(round(1.0 / keep, 5))}
    assert (perMap[:, :, 0] == 0).any(), "nothing was dropped at p=0.5"

    # backward uses the SAME mask
    grad = np.random.randn(*data.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    mask = (perMap[:, :, 0] != 0).astype(np.float32)[:, :, None, None]
    assert np.allclose(mod.grad.get(), grad * mask / keep, atol=1e-5)

    # eval mode: identity
    mod.evalMode()
    assert np.allclose(mod(gpuarray.to_gpu(data)).get(), data, atol=0)


def testMulAddConst():
    from puzzlelib_tpu.modules import MulAddConst

    np.random.seed(28)
    mod = MulAddConst(a=2.5, b=-0.75)

    data = np.random.randn(4, 5).astype(np.float32)
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), 2.5 * data - 0.75, atol=1e-6)

    grad = np.random.randn(4, 5).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), 2.5 * grad, atol=1e-6)


def testMoveAxis():
    from puzzlelib_tpu.modules import MoveAxis

    np.random.seed(29)
    mod = MoveAxis(src=1, dst=3)

    data = np.random.randn(2, 3, 4, 5).astype(np.float32)
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), np.moveaxis(data, 1, 3), atol=0)

    grad = np.random.randn(*out.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), np.moveaxis(grad, 3, 1), atol=0)

    assert mod.dataShapeFrom((2, 3, 4, 5)) == (2, 4, 5, 3)


def testTransposeModule():
    from puzzlelib_tpu.modules import Transpose

    np.random.seed(30)
    axes = (0, 2, 3, 1)
    mod = Transpose(axes=axes)

    data = np.random.randn(2, 3, 4, 5).astype(np.float32)
    out = mod(gpuarray.to_gpu(data))
    assert np.allclose(out.get(), data.transpose(axes), atol=0)

    grad = np.random.randn(*out.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    assert np.allclose(mod.grad.get(), grad.transpose(np.argsort(axes)), atol=0)


def testMulModule():
    from puzzlelib_tpu.modules import Mul

    np.random.seed(31)
    a = np.random.randn(3, 4).astype(np.float32)
    b = np.random.randn(3, 4).astype(np.float32)
    c = np.random.randn(3, 4).astype(np.float32)

    mod = Mul()
    out = mod([gpuarray.to_gpu(a), gpuarray.to_gpu(b), gpuarray.to_gpu(c)])
    assert np.allclose(out.get(), a * b * c, atol=1e-5)

    grad = np.random.randn(3, 4).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))
    for ours, expect in zip(mod.grad, (grad * b * c, grad * a * c, grad * a * b)):
        assert np.allclose(ours.get(), expect, atol=1e-5)


def testUpsample3D():
    from puzzlelib_tpu.modules import Upsample3D

    np.random.seed(32)
    mod = Upsample3D(scale=2, mode="nearest")

    data = np.random.randn(2, 3, 2, 3, 4).astype(np.float32)
    out = mod(gpuarray.to_gpu(data))

    expected = data.repeat(2, axis=2).repeat(2, axis=3).repeat(2, axis=4)
    assert np.allclose(out.get(), expected, atol=0)

    grad = np.random.randn(*out.shape).astype(np.float32)
    mod.backward(gpuarray.to_gpu(grad))

    g = grad.reshape(2, 3, 2, 2, 3, 2, 4, 2).sum(axis=(3, 5, 7))
    assert np.allclose(mod.grad.get(), g, atol=1e-5)
