import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray


def testLeNetForward():
    from puzzlelib_tpu.models.nets import loadLeNet

    np.random.seed(0)
    net = loadLeNet(None, initscheme=None)

    data = gpuarray.to_gpu(np.random.randn(2, 1, 28, 28).astype(np.float32))
    assert net(data).shape == (2, 10)


def testNiNShape():
    from puzzlelib_tpu.models.nets import loadNiNImageNet

    net = loadNiNImageNet(None, initscheme="none")
    assert net.dataShapeFrom((1, 3, 224, 224)) == (1, 1000)


def testVGGShapes():
    from puzzlelib_tpu.models.nets import loadVGG

    for layers, nconvs in (("11", 8), ("16", 13), ("19", 16)):
        net = loadVGG(None, layers, initscheme="none")

        from puzzlelib_tpu.modules import Conv2D
        assert len(net.getAllByType(Conv2D)) == nconvs
        assert net.dataShapeFrom((1, 3, 224, 224)) == (1, 1000)


def testResNet50Shape():
    from puzzlelib_tpu.models.nets import loadResNet

    net = loadResNet(None, layers="50", initscheme="none")
    assert net.dataShapeFrom((1, 3, 224, 224)) == (1, 1000)

    from puzzlelib_tpu.modules import Conv2D
    assert len(net.getAllByType(Conv2D)) == 53


def testUNetShape():
    from puzzlelib_tpu.models.nets import loadUNet

    net = loadUNet(None, initscheme="none")
    assert net.dataShapeFrom((1, 1, 64, 64)) == (1, 1, 64, 64)


def testUNetNumericOracle():
    """Whole-net forward+backward vs the independent torch float64 oracle
    (reference semantics: Models/Nets/UNet.py)."""
    from torchoracle import checkNetAgainstOracle
    from puzzlelib_tpu.models.nets import loadUNet
    from puzzlelib_tpu.modules import Dropout

    np.random.seed(10)
    net = loadUNet(None, initscheme=None)

    for drop in net.getAllByType(Dropout):
        drop.evalMode()

    data = np.random.randn(1, 1, 32, 32).astype(np.float32)
    checkNetAgainstOracle(net, data, seed=11)


def testInceptionShapes():
    from puzzlelib_tpu.models.nets import loadInceptionBN, loadInceptionV3

    bn = loadInceptionBN(None, initscheme="none")
    assert bn.dataShapeFrom((1, 3, 224, 224)) == (1, 1000)

    v3 = loadInceptionV3(None, initscheme="none")
    assert v3.dataShapeFrom((1, 3, 299, 299)) == (1, 1008)


def testW2LShape():
    from puzzlelib_tpu.models.nets import loadW2L

    net = loadW2L(None, inmaps=161, nlabels=29)
    shape = net.dataShapeFrom((1, 161, 200))
    assert shape == (1, 29, 100)


def testW2LNumericOracle():
    """Whole-net forward+backward vs the torch float64 oracle
    (reference semantics: Models/Nets/WaveToLetter.py)."""
    from torchoracle import checkNetAgainstOracle
    from puzzlelib_tpu.models.nets import loadW2L
    from puzzlelib_tpu.modules import Dropout

    np.random.seed(12)
    net = loadW2L(None, inmaps=161, nlabels=29)

    for drop in net.getAllByType(Dropout):
        drop.evalMode()

    data = np.random.randn(1, 161, 64).astype(np.float32)
    checkNetAgainstOracle(net, data, seed=13)


def testMiniYoloShape():
    from puzzlelib_tpu.models.nets import loadMiniYolo

    net = loadMiniYolo(None, numOutput=1470, initscheme="none")
    assert net.dataShapeFrom((1, 3, 448, 448)) == (1, 1470)


def testMiniYoloNumericOracle():
    """Whole-net forward+backward vs the torch float64 oracle
    (reference semantics: Models/Nets/MiniYolo.py)."""
    from torchoracle import checkNetAgainstOracle
    from puzzlelib_tpu.models.nets import loadMiniYolo

    np.random.seed(14)
    net = loadMiniYolo(None, numOutput=1470, initscheme=None)

    data = np.random.randn(1, 3, 448, 448).astype(np.float32)
    # 24 conv layers of LeakyReLU at 448x448: f32-vs-f64 activation-branch
    # flips accumulate, so late-layer bias grads carry ~2.5e-2*globalScale of
    # benign chaos - widen the floor (wiring bugs are O(globalScale))
    checkNetAgainstOracle(net, data, seed=15, absFloor=5e-2)


def testSentiNetForward():
    from puzzlelib_tpu.models.nets import loadSentiNet

    np.random.seed(1)
    net = loadSentiNet(None, vocabulary=100, branches=[3, 4, 5], sentlength=20, embsize=16)

    data = gpuarray.to_gpu(np.random.randint(0, 100, size=(2, 20)).astype(np.int32))
    net.evalMode()
    assert net(data).shape == (2, 2)
