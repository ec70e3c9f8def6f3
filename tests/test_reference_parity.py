"""Cross-framework parity against the reference implementation.

The reference's pure-numpy CPU backend (/root/reference/CPU/CPUArray.py,
Config.backend=cpu) runs GPU-free, so it serves as the independent oracle the
BASELINE demands: identical nets are built in both frameworks, checkpoints
written by one are loaded by the other, and forward/backward/training results
must agree to 1e-4.

Skipped when /root/reference is not present.
"""

import os
import sys
import tempfile

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference tree not available")

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    """Import the reference framework on its numpy CPU backend."""
    wrapper = tempfile.mkdtemp(prefix="refwrap")
    link = os.path.join(wrapper, "PuzzleLib")
    if not os.path.exists(link):
        os.symlink(REFERENCE, link)

    sys.path.insert(0, wrapper)

    from PuzzleLib import Config
    Config.backend = Config.Backend.cpu

    import PuzzleLib.Backend.gpuarray  # noqa: F401  (binds the CPU backend)
    import PuzzleLib.Modules as RefModules
    import PuzzleLib.Containers as RefContainers
    import PuzzleLib.Cost as RefCost
    import PuzzleLib.Optimizers as RefOptimizers
    import PuzzleLib.Backend.gpuarray as RefArray
    import PuzzleLib.Blueprint as RefBlueprint

    class Namespace:
        Modules, Containers, Cost = RefModules, RefContainers, RefCost
        Optimizers, gpuarray, Blueprint = RefOptimizers, RefArray, RefBlueprint

    return Namespace


def _buildConvNet(M, C):
    """The same small conv net in either framework: M=Modules, C=Containers."""
    net = C.Sequential(name="parity")

    net.append(M.Conv2D(1, 6, 3, name="c1"))
    net.append(M.MaxPool2D(name="p1"))
    net.append(M.Activation(M.relu, name="a1"))
    net.append(M.BatchNorm2D(6, name="bn1"))
    net.append(M.Conv2D(6, 4, 3, name="c2"))
    net.append(M.Flatten(name="f1"))
    net.append(M.Linear(4 * 11 * 11, 10, name="fc1"))

    return net


def _buildOurConvNet():
    from puzzlelib_tpu import modules as M
    from puzzlelib_tpu import containers as C
    return _buildConvNet(M, C)


def _refForward(refNs, net, hostData):
    net.evalMode()
    out = net(refNs.gpuarray.to_gpu(hostData))
    return np.asarray(out.get())


def _ourForward(net, hostData):
    from puzzlelib_tpu.backend import gpuarray
    net.evalMode()
    return np.asarray(net(gpuarray.to_gpu(hostData)).get())


def testReferenceCheckpointLoadsHere(ref):
    """A checkpoint written by the reference loads here; forward agrees."""
    np.random.seed(10)
    refNet = _buildConvNet(ref.Modules, ref.Containers)
    image = refNet.save(withBlueprint=True)

    ours = _buildOurConvNet()
    ours.load(image)

    x = np.random.randn(4, 1, 28, 28).astype(np.float32)
    got, expect = _ourForward(ours, x), _refForward(ref, refNet, x)

    assert np.allclose(got, expect, atol=ATOL), float(np.abs(got - expect).max())


def testOurCheckpointLoadsInReference(ref):
    """A checkpoint written here loads in the reference; forward agrees."""
    np.random.seed(11)
    ours = _buildOurConvNet()
    image = ours.save(withBlueprint=True)

    refNet = _buildConvNet(ref.Modules, ref.Containers)
    refNet.load(image)

    x = np.random.randn(4, 1, 28, 28).astype(np.float32)
    got, expect = _ourForward(ours, x), _refForward(ref, refNet, x)

    assert np.allclose(got, expect, atol=ATOL), float(np.abs(got - expect).max())


def testBlueprintCrossBuild(ref):
    """Our Blueprint.load rebuilds a net from a reference-written checkpoint
    (architecture JSON + weights) without a hand-built skeleton."""
    np.random.seed(12)
    refNet = _buildConvNet(ref.Modules, ref.Containers)
    image = refNet.save(withBlueprint=True)

    from puzzlelib_tpu import blueprint
    ours = blueprint.load(image)

    x = np.random.randn(2, 1, 28, 28).astype(np.float32)
    got, expect = _ourForward(ours, x), _refForward(ref, refNet, x)

    assert np.allclose(got, expect, atol=ATOL), float(np.abs(got - expect).max())


def _trainSteps(framework, net, gpuarray, cost, optimizer, data, target, steps):
    """Identical manual train loop in either framework (momentum=0.0 because
    the reference CPU gemm supports no accumulation)."""
    errors = []
    dev, tgt = gpuarray.to_gpu(data), gpuarray.to_gpu(target)

    for _ in range(steps):
        err, grad = cost(net(dev), tgt)
        errors.append(float(err))

        optimizer.zeroGradParams()
        net.backward(grad, updGrad=False, momentum=0.0)
        optimizer.update()

        net.reset()

    return errors


def testTrainingParityMlp(ref):
    """Same MLP + MomentumSGD + MSE trained in both frameworks from the same
    checkpoint on the same data: per-step losses and final weights to 1e-4.
    This is the BASELINE GradientCheck-vs-numpy-oracle gate, executed as
    full-loop agreement instead of a relaxed finite-difference bound."""
    np.random.seed(13)

    def build(M, C):
        net = C.Sequential(name="mlp")
        net.append(M.Linear(12, 16, name="l1"))
        net.append(M.Activation(M.relu, name="a1"))
        net.append(M.Linear(16, 5, name="l2"))
        return net

    refNet = build(ref.Modules, ref.Containers)
    image = refNet.save()

    from puzzlelib_tpu import modules as M
    from puzzlelib_tpu import containers as C
    from puzzlelib_tpu.backend import gpuarray as ourArray
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD

    ourNet = build(M, C)
    ourNet.load(image)

    data = np.random.randn(8, 12).astype(np.float32)
    target = np.random.randn(8, 5).astype(np.float32)

    refOpt = ref.Optimizers.MomentumSGD(learnRate=0.05, momRate=0.9)
    refOpt.setupOn(refNet, useGlobalState=True)

    ourOpt = MomentumSGD(learnRate=0.05, momRate=0.9)
    ourOpt.setupOn(ourNet, useGlobalState=True)

    refErrs = _trainSteps("ref", refNet, ref.gpuarray, ref.Cost.MSE(), refOpt, data, target, steps=8)
    ourErrs = _trainSteps("ours", ourNet, ourArray, MSE(), ourOpt, data, target, steps=8)

    assert np.allclose(refErrs, ourErrs, atol=ATOL), (refErrs, ourErrs)

    for name in ("l1", "l2"):
        theirs = np.asarray(refNet[name].W.get())
        mine = np.asarray(ourNet[name].W.get())
        assert np.allclose(mine, theirs, atol=ATOL), (name, float(np.abs(mine - theirs).max()))


def testForwardParityPerModule(ref):
    """Module-level forward agreement on shared random weights: the per-module
    sweep SURVEY 7 step 1 called for, limited to what the reference CPU
    backend implements."""
    np.random.seed(14)

    x4 = np.random.randn(2, 3, 12, 12).astype(np.float32)
    x2 = np.random.randn(6, 10).astype(np.float32)

    cases = [
        ("Conv2D", lambda M: M.Conv2D(3, 5, 3, name="m"), x4),
        ("Conv2D-strided", lambda M: M.Conv2D(3, 5, 3, stride=2, pad=1, name="m"), x4),
        ("MaxPool2D", lambda M: M.MaxPool2D(name="m"), x4),
        ("AvgPool2D", lambda M: M.AvgPool2D(name="m"), x4),
        ("Linear", lambda M: M.Linear(10, 7, name="m"), x2),
        ("Activation-relu", lambda M: M.Activation(M.relu, name="m"), x2),
        ("Activation-sigmoid", lambda M: M.Activation(M.sigmoid, name="m"), x2),
        ("Activation-tanh", lambda M: M.Activation(M.tanh, name="m"), x2),
        # SoftMax is omitted: the reference CPU backend never binds softmaxNd
        # (/root/reference/Backend/Dnn.py:341-371), so there is no oracle there
        ("BatchNorm2D-eval", lambda M: M.BatchNorm2D(3, name="m"), x4),
    ]

    from puzzlelib_tpu import modules as M

    for label, factory, x in cases:
        refMod = factory(ref.Modules)
        image = refMod.save()

        ourMod = factory(M)
        ourMod.load(image)

        refMod.evalMode()
        ourMod.evalMode()

        expect = np.asarray(refMod(ref.gpuarray.to_gpu(x)).get())

        from puzzlelib_tpu.backend import gpuarray
        got = np.asarray(ourMod(gpuarray.to_gpu(x)).get())

        assert np.allclose(got, expect, atol=ATOL), (label, float(np.abs(got - expect).max()))


def testRealDataAccuracyParity(ref):
    """Both frameworks train the same MLP on the UCI handwritten-digits
    dataset (the only real dataset available offline) from one shared
    checkpoint and reach the SAME validation accuracy — and that accuracy is
    high enough to prove genuine learning, not just numeric agreement."""
    sklearn = pytest.importorskip("sklearn.datasets")

    digits = sklearn.load_digits()
    x = (digits.images.reshape(-1, 64) / 16.0).astype(np.float32)
    y = digits.target.astype(np.int32)

    split = 1500
    trainX, trainY, valX, valY = x[:split], y[:split], x[split:], y[split:]

    # the reference CPU backend binds no classification cost kernels
    # (/root/reference/Backend/Kernels/Costs.py:76 initCPU is a no-op), so the
    # shared loss is MSE against one-hot targets
    trainHot = np.eye(10, dtype=np.float32)[trainY]

    def build(M, C):
        net = C.Sequential(name="digits")
        net.append(M.Linear(64, 64, name="h"))
        net.append(M.Activation(M.relu, name="a"))
        net.append(M.Linear(64, 10, name="out"))
        return net

    np.random.seed(15)
    refNet = build(ref.Modules, ref.Containers)
    image = refNet.save()

    from puzzlelib_tpu import modules as M
    from puzzlelib_tpu import containers as C
    from puzzlelib_tpu.backend import gpuarray as ourArray
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.optimizers import MomentumSGD

    ourNet = build(M, C)
    ourNet.load(image)

    def train(net, gpuarray, cost, optimizer, epochs=60, batch=100):
        for _ in range(epochs):
            for i in range(split // batch):
                bx = gpuarray.to_gpu(trainX[i * batch:(i + 1) * batch])
                by = gpuarray.to_gpu(trainHot[i * batch:(i + 1) * batch])

                _, grad = cost(net(bx), by)
                optimizer.zeroGradParams()
                net.backward(grad, updGrad=False, momentum=0.0)
                optimizer.update()
                net.reset()

    def accuracy(net, gpuarray):
        net.evalMode()
        preds = np.asarray(net(gpuarray.to_gpu(valX)).get()).argmax(axis=1)
        net.trainMode()
        return float((preds == valY).mean())

    refOpt = ref.Optimizers.MomentumSGD(learnRate=0.5, momRate=0.9)
    refOpt.setupOn(refNet, useGlobalState=True)
    train(refNet, ref.gpuarray, ref.Cost.MSE(), refOpt)

    ourOpt = MomentumSGD(learnRate=0.5, momRate=0.9)
    ourOpt.setupOn(ourNet, useGlobalState=True)
    train(ourNet, ourArray, MSE(), ourOpt)

    refAcc, ourAcc = accuracy(refNet, ref.gpuarray), accuracy(ourNet, ourArray)

    assert ourAcc >= 0.90, "did not learn: %.3f" % ourAcc
    assert abs(refAcc - ourAcc) <= 0.02, (refAcc, ourAcc)


def _randomizeState(net, rng):
    """Deterministically fill every parameter and stat attribute of a
    reference-or-ours net (builders use initscheme='none' = uninitialized)."""
    def walk(mod):
        for name, var in getattr(mod, "vars", {}).items():
            data = rng.normal(scale=0.05, size=var.data.shape).astype(np.float32)
            var.data.set(data)

        for name, attr in getattr(mod, "attrs", {}).items():
            if "var" in name:
                data = rng.uniform(0.5, 1.5, size=attr.shape).astype(np.float32)
            else:
                data = rng.normal(scale=0.05, size=attr.shape).astype(np.float32)
            attr.set(data)

        for child in getattr(mod, "modules", {}).values():
            walk(child)

    walk(net)


@pytest.mark.parametrize("which", ["nin", "resnet50", "openposecoco", "openposempi"])
def testModelZooNumericParity(ref, which):
    """Zoo builders against the reference CPU backend on one shared random
    checkpoint: forward agreement at 1e-4 (the shape-only zoo tests cannot
    catch weight-layout or plumbing regressions; this does).

    MiniYolo/UNet are omitted: the reference CPU backend cannot forward them
    (mid-net SoftMax / unbound conv kernels), so no oracle exists there.
    """
    import importlib

    np.random.seed(16)
    rng = np.random.RandomState(16)

    if which == "nin":
        refMod = importlib.import_module("PuzzleLib.Models.Nets.NiN")
        build = lambda m: m.loadNiNImageNet(None)
        ours = importlib.import_module("puzzlelib_tpu.models.nets.nin")
        x = np.random.randn(1, 3, 224, 224).astype(np.float32)
        drop = 1                                   # reference CPU has no SoftMax kernel
    elif which == "resnet50":
        refMod = importlib.import_module("PuzzleLib.Models.Nets.ResNet")
        build = lambda m: m.loadResNet(None, "50")
        ours = importlib.import_module("puzzlelib_tpu.models.nets.resnet")
        x = np.random.randn(1, 3, 224, 224).astype(np.float32)
        drop = 1
    elif which == "openposecoco":
        refMod = importlib.import_module("PuzzleLib.Models.Nets.OpenPoseCOCO")
        build = lambda m: m.loadCOCO(None)
        ours = importlib.import_module("puzzlelib_tpu.models.nets.openposecoco")
        x = np.random.randn(1, 3, 184, 184).astype(np.float32)
        drop = 0
    else:
        refMod = importlib.import_module("PuzzleLib.Models.Nets.OpenPoseMPI")
        build = lambda m: m.loadMPI(None)
        ours = importlib.import_module("puzzlelib_tpu.models.nets.openposempi")
        x = np.random.randn(1, 3, 184, 184).astype(np.float32)
        drop = 0

    refNet = build(refMod)
    for _ in range(drop):
        refNet.pop()

    _randomizeState(refNet, rng)
    image = refNet.save()

    ourNet = build(ours)
    for _ in range(drop):
        ourNet.pop()
    ourNet.load(image)

    expect = _refForward(ref, refNet, x)
    got = _ourForward(ourNet, x)

    assert got.shape == expect.shape

    # activations grow by orders of magnitude through 30+ random-weight convs
    # (OpenPose reaches ~1e5), so the 1e-4 gate is relative to the output scale
    err = float(np.abs(got - expect).max()) / max(1.0, float(np.abs(expect).max()))
    assert err < ATOL, (which, err)


def testZooPretrainedFileEntry(ref, tmp_path):
    """The zoo's actual pretrained contract: a reference-format checkpoint
    FILE (saved with assumeUniqueNames=True, the layout the published model
    hdfs use — /root/reference/Models/Nets/ResNet.py:119 loads with
    assumeUniqueNames=True) goes through our ``loadResNet(modelpath, "50")``
    entry point, not a hand-plumbed net.load()."""
    import importlib

    rng = np.random.RandomState(17)
    np.random.seed(17)

    refMod = importlib.import_module("PuzzleLib.Models.Nets.ResNet")
    refNet = refMod.loadResNet(None, "50")
    refNet.pop()                                   # reference CPU binds no SoftMax

    _randomizeState(refNet, rng)

    modelpath = str(tmp_path / "resnet50-ref.hdf")
    refNet.save(modelpath, assumeUniqueNames=True)

    from puzzlelib_tpu.models.nets.resnet import loadResNet

    ours = loadResNet(modelpath, "50")
    ours.pop()                                     # compare pre-softmax

    x = np.random.randn(1, 3, 224, 224).astype(np.float32)
    got, expect = _ourForward(ours, x), _refForward(ref, refNet, x)

    err = float(np.abs(got - expect).max()) / max(1.0, float(np.abs(expect).max()))
    assert err < ATOL, err


def testCaffemodelThroughZooNet(ref, tmp_path):
    """A real .caffemodel-format blob (protobuf wire bytes, synthesized with
    our own writer) converted by the importer and consumed through the NiN zoo
    loader in BOTH frameworks: the full pretrained-import pipeline the
    reference ships (/root/reference/Converter/Caffe/ConvertModel.py:7 ->
    Models/Nets/NiN.py), checked end-to-end by forward agreement."""
    from puzzlelib_tpu.converter.onnx import protowire as pw
    from puzzlelib_tpu.converter.caffe import convert
    from puzzlelib_tpu.models.nets.nin import loadNiNImageNet, _LAYOUT

    rng = np.random.RandomState(18)

    def blob(arr):
        shape = b"".join(pw.encodeInt(1, d) for d in arr.shape)
        out = pw.encodeMessage(7, shape)
        out += pw.encodeField(5, pw.WIRE_BYTES, arr.astype("<f4").tobytes())
        return out

    netparam = pw.encodeBytes(1, "CaffeNet")
    for entry in _LAYOUT:
        if entry is None:
            continue

        inmaps, outmaps, size, _, _, convname = entry
        fanin = inmaps * size * size
        W = (rng.randn(outmaps, inmaps, size, size) / np.sqrt(fanin)).astype(np.float32)
        b = (rng.randn(outmaps) * 0.01).astype(np.float32)

        layer = pw.encodeBytes(1, convname) + pw.encodeBytes(2, "Convolution") \
            + pw.encodeMessage(7, blob(W)) + pw.encodeMessage(7, blob(b))
        netparam += pw.encodeMessage(100, layer)

    caffepath = str(tmp_path / "nin.caffemodel")
    with open(caffepath, "wb") as f:
        f.write(netparam)

    hdfpath = str(tmp_path / "nin.hdf")
    convert(caffepath, hdfpath)

    import importlib
    refMod = importlib.import_module("PuzzleLib.Models.Nets.NiN")

    refNet = refMod.loadNiNImageNet(hdfpath)
    refNet.pop()                                   # reference CPU binds no SoftMax

    ours = loadNiNImageNet(hdfpath)
    ours.pop()

    np.random.seed(18)
    x = np.random.randn(1, 3, 224, 224).astype(np.float32)
    got, expect = _ourForward(ours, x), _refForward(ref, refNet, x)

    assert np.isfinite(got).all()
    err = float(np.abs(got - expect).max()) / max(1.0, float(np.abs(expect).max()))
    assert err < ATOL, err
