import os

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu import blueprint as Blueprint
from puzzlelib_tpu.containers import Sequential, Parallel, Graph
from puzzlelib_tpu.modules import Linear, Activation, relu, Replicate, Concat, Conv2D, BatchNorm2D


def buildNet():
    seq = Sequential()

    seq.append(Linear(20, 10, name="linear-1"))
    seq.append(Activation(relu, name="relu-1"))

    seq.append(Linear(10, 5, name="linear-2"))
    seq.append(Activation(relu, name="relu-2"))

    seq.append(Replicate(times=2, name="repl"))
    seq.append(Parallel().append(Linear(5, 2, name="linear-3-1")).append(Linear(5, 3, name="linear-3-2")))
    seq.append(Concat(axis=1, name="concat"))

    return seq


def testBlueprintFileRoundTrip(tmp_path):
    np.random.seed(0)
    net = buildNet()

    path = str(tmp_path / "net.hdf")
    net.save(path, withBlueprint=True)

    rebuilt = Blueprint.load(path)

    data = gpuarray.to_gpu(np.random.randn(4, 20).astype(np.float32))
    assert np.allclose(net(data).get(), rebuilt(data).get(), atol=1e-6)


def testBlueprintMemoryRoundTrip():
    np.random.seed(1)
    net = buildNet()

    buffer = net.save(withBlueprint=True)
    assert isinstance(buffer, bytes)

    rebuilt = Blueprint.load(buffer)

    data = gpuarray.to_gpu(np.random.randn(4, 20).astype(np.float32))
    assert np.allclose(net(data).get(), rebuilt(data).get(), atol=1e-6)


def testBlueprintGraphRoundTrip(tmp_path):
    np.random.seed(2)

    inp = Linear(20, 10, name="linear-1").node()
    h = Activation(relu, name="relu-1").node(inp)

    h1 = Linear(10, 5, name="linear-2").node(h)
    h2 = Linear(10, 5, name="linear-3").node(h)

    output = Concat(axis=1, name="concat").node(h1, h2)
    graph = Graph(inputs=inp, outputs=output)

    path = str(tmp_path / "graph.hdf")
    graph.save(path, withBlueprint=True)

    rebuilt = Blueprint.load(path)

    data = gpuarray.to_gpu(np.random.randn(4, 20).astype(np.float32))
    assert np.allclose(graph(data).get(), rebuilt(data).get(), atol=1e-6)


def testConvBnBlueprint(tmp_path):
    np.random.seed(3)

    net = Sequential()
    net.append(Conv2D(3, 8, 3, pad=1, name="conv"))
    net.append(BatchNorm2D(8, name="bn"))

    net.trainMode()
    data = gpuarray.to_gpu(np.random.randn(2, 3, 6, 6).astype(np.float32))
    net(data)  # advance running stats

    path = str(tmp_path / "convbn.hdf")
    net.save(path, withBlueprint=True)

    rebuilt = Blueprint.load(path)
    rebuilt.evalMode()
    net.evalMode()

    assert np.allclose(net(data).get(), rebuilt(data).get(), atol=1e-5)


def testBf16CheckpointRoundTrip(tmp_path):
    """bfloat16 params survive save/load: HDF5 has no native bf16, so the
    codec stores opaque bytes tagged with a ``dtype`` attribute."""
    import ml_dtypes

    bf16 = np.dtype(ml_dtypes.bfloat16).type
    np.random.seed(4)

    def build():
        net = Sequential()
        net.append(Conv2D(3, 8, 3, pad=1, name="conv"))
        net.append(Linear(8 * 36, 4, name="fc2d"))
        return net

    net = build()
    net.calcMode(bf16)

    path = str(tmp_path / "bf16.hdf")
    net.save(path)

    other = build()
    other.calcMode(bf16)
    other.load(path)

    for mod in ("conv", "fc2d"):
        assert other[mod].W.dtype == np.dtype(bf16)
        assert np.array_equal(
            net[mod].W.get().view(np.uint16), other[mod].W.get().view(np.uint16),
        )
