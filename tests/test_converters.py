import json

import numpy as np
import pytest

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv2D, BatchNorm2D, Activation, relu, MaxPool2D, Flatten, Linear, SoftMax


def buildSmallNet():
    net = Sequential(name="convnet")
    net.append(Conv2D(3, 4, 3, pad=1, name="conv1"))
    net.append(BatchNorm2D(4, name="bn1"))
    net.append(Activation(relu, name="relu1"))
    net.append(MaxPool2D(name="pool1"))
    net.append(Flatten(name="flatten"))
    net.append(Linear(4 * 4 * 4, 10, name="fc"))
    net.append(SoftMax(name="probs"))
    return net


def testOnnxExportRoundTrip(tmp_path):
    from puzzlelib_tpu.converter.onnx import ONNXExporter
    from puzzlelib_tpu.converter.onnx import onnxmodel

    np.random.seed(0)
    net = buildSmallNet()
    net.evalMode()

    exporter = ONNXExporter()
    model = exporter.export(net, (1, 3, 8, 8), str(tmp_path))

    raw = (tmp_path / "convnet.onnx").read_bytes()
    parsed = onnxmodel.parseModel(raw)

    graph = parsed["graph"]
    opTypes = [n["op_type"] for n in graph["nodes"]]

    assert "Conv" in opTypes and "BatchNormalization" in opTypes and "Softmax" in opTypes
    assert graph["outputs"][0]["shape"] == (1, 10)

    # weights survive the round trip bit-exact
    inits = {t["name"]: t for t in graph["initializer"]}
    W = inits["convnet.conv1.W"]["vals"]
    assert np.allclose(W, net["conv1"].W.get())


def testCaffeImportRoundTrip(tmp_path):
    """Encode a NetParameter with our wire writer, decode with the importer."""
    from puzzlelib_tpu.converter.onnx import protowire as pw
    from puzzlelib_tpu.converter.caffe import loadNetParameter, js2hdf

    import h5py

    W = np.random.randn(4, 3, 3, 3).astype(np.float32)
    b = np.random.randn(4).astype(np.float32)

    def blob(arr):
        shape = b"".join(pw.encodeInt(1, d) for d in arr.shape)
        out = pw.encodeMessage(7, shape)
        out += pw.encodeField(5, pw.WIRE_BYTES, arr.astype("<f4").tobytes())  # packed floats
        return out

    layer = pw.encodeBytes(1, "conv1") + pw.encodeBytes(2, "Convolution") \
        + pw.encodeMessage(7, blob(W)) + pw.encodeMessage(7, blob(b))

    netparam = pw.encodeBytes(1, "testnet") + pw.encodeMessage(100, layer)

    path = tmp_path / "model.caffemodel"
    path.write_bytes(netparam)

    js = loadNetParameter(str(path))
    assert js["name"] == "testnet"
    assert js["layer"][0]["type"] == "Convolution"

    hdfpath = str(tmp_path / "model.hdf")
    js2hdf(js, hdfpath)

    with h5py.File(hdfpath, "r") as hdf:
        wIdx = int(np.array(hdf["links"]["testnet.conv1.W"]))
        assert np.allclose(np.array(hdf["params"][str(wIdx)]), W)


def testMxnetImport(tmp_path):
    from puzzlelib_tpu.converter.mxnet import convert

    import struct
    import h5py

    W = np.random.randn(4, 3, 3, 3).astype(np.float32)
    b = np.random.randn(4).astype(np.float32)

    paramsname = str(tmp_path / "model.params")
    with open(paramsname, "wb") as f:
        f.write(struct.pack("<QQ", 0x112, 0))

        tensors = [W, b]
        f.write(struct.pack("<Q", len(tensors)))
        for t in tensors:
            f.write(struct.pack("<I", t.ndim))
            f.write(struct.pack("<" + "I" * t.ndim, *t.shape))
            f.write(struct.pack("<iii", 1, 0, 0))
            f.write(t.tobytes())

        keys = ["arg:conv0_weight", "arg:conv0_bias"]
        f.write(struct.pack("<Q", len(keys)))
        for k in keys:
            f.write(struct.pack("<Q", len(k)))
            f.write(k.encode())

    symbolsname = str(tmp_path / "model-symbol.json")
    with open(symbolsname, "w") as f:
        json.dump({"nodes": [{"name": "conv0", "op": "Convolution", "inputs": []}]}, f)

    hdfpath = convert(paramsname, symbolsname, str(tmp_path / "model.hdf"))

    with h5py.File(hdfpath, "r") as hdf:
        wIdx = int(np.array(hdf["links"]["model.conv0.W"]))
        assert np.allclose(np.array(hdf["params"][str(wIdx)]), W)


def testEngineBuildAndRun(tmp_path):
    from puzzlelib_tpu.converter.engine import buildEngine, Engine

    np.random.seed(1)
    net = buildSmallNet()
    net.evalMode()

    data = gpuarray.to_gpu(np.random.randn(1, 3, 8, 8).astype(np.float32))
    expected = net(data).get()
    net.reset()

    engine = buildEngine(net, (1, 3, 8, 8), str(tmp_path))
    out = engine(data)

    assert np.allclose(out.get(), expected, atol=1e-5)

    # reload from disk like a deployment process would
    engine2 = Engine(str(tmp_path / "convnet.float32.engine"))
    out2 = engine2(data)
    assert np.allclose(out2.get(), expected, atol=1e-5)

    assert (tmp_path / "convnet.float32.stablehlo.mlir").exists()


def testInt8Engine(tmp_path):
    """int8 quantized engine: entropy-calibrated activations, per-channel weights
    (reference int8 mode: Converter/TensorRT/DataCalibrator.py)."""
    import re

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Activation, relu, Flatten, Linear
    from puzzlelib_tpu.converter.engine import buildEngine, DataCalibrator

    np.random.seed(11)

    net = Sequential(name="qnet")
    net.append(Conv2D(1, 8, 3, pad=1))
    net.append(MaxPool2D())
    net.append(Activation(relu))
    net.append(Flatten())
    net.append(Linear(8 * 6 * 6, 10))

    calib = np.random.randn(64, 1, 12, 12).astype(np.float32)

    for algo in ("entropy", "minmax"):
        engine = buildEngine(net, inshape=(4, 1, 12, 12), savepath=str(tmp_path), dtype="int8",
                             name="qnet_" + algo, calibrator=DataCalibrator(calib, batchsize=16, algo=algo))

        x = np.random.randn(4, 1, 12, 12).astype(np.float32)
        qout = engine(gpuarray.to_gpu(x)).get()

        net.evalMode()
        fout = net(gpuarray.to_gpu(x)).get()

        cos = float(np.sum(qout * fout) / (np.linalg.norm(qout) * np.linalg.norm(fout)))
        assert cos > 0.99, "%s int8 engine diverged (cos=%s)" % (algo, cos)

    # the serialized program must actually compute in int8 (i8 x i8 -> i32 dot)
    mlir = (tmp_path / "qnet_minmax.int8.stablehlo.mlir").read_text()
    assert re.search(r"dot_general.*xi8>.*xi8>\) -> tensor<[0-9x]*xi32>", mlir)

    # the fp32 net must be restored after engine build
    before = net(gpuarray.to_gpu(np.ones((1, 1, 12, 12), np.float32))).get()
    after = net(gpuarray.to_gpu(np.ones((1, 1, 12, 12), np.float32))).get()
    assert np.allclose(before, after)


def testInt8EngineRequiresCalibrator(tmp_path):
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear
    from puzzlelib_tpu.converter.engine import buildEngine

    net = Sequential(name="nocal")
    net.append(Linear(4, 2))

    with pytest.raises(ValueError, match="DataCalibrator"):
        buildEngine(net, inshape=(1, 4), savepath=str(tmp_path), dtype="int8")


def testHalfPrecisionEngines(tmp_path):
    """bf16/fp16 engines trace a calcMode-cast clone; the user's f32 net is untouched."""
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, Activation, relu, Flatten, Linear
    from puzzlelib_tpu.converter.engine import buildEngine

    np.random.seed(13)
    net = Sequential(name="hp")
    net.append(Conv2D(3, 4, 3))
    net.append(Activation(relu))
    net.append(Flatten())
    net.append(Linear(4 * 6 * 6, 5))

    x = np.random.randn(2, 3, 8, 8).astype(np.float32)

    f32 = buildEngine(net, inshape=(2, 3, 8, 8), savepath=str(tmp_path),
                      dtype="float32")(gpuarray.to_gpu(x)).get()

    for dt in ("bfloat16", "float16"):
        out = buildEngine(net, inshape=(2, 3, 8, 8), savepath=str(tmp_path),
                          dtype=dt)(gpuarray.to_gpu(x)).get()
        cos = float(np.sum(out * f32) / (np.linalg.norm(out) * np.linalg.norm(f32)))
        assert out.dtype == np.float32 and cos > 0.999, (dt, cos)

    assert net[0].W.get().dtype == np.float32, "engine build mutated the source net"


def testRnnWeightLayoutConversion():
    """cuDNN packed blob <-> native layout: round trip is exact and the
    converted blob presents the same named per-gate views."""
    import numpy as np
    from puzzlelib_tpu.converter.rnnweights import convertRnnWeights, cudnnRnnLayout
    from puzzlelib_tpu.backend.rnn import RnnDesc

    for mode, direction, layers in [("lstm", "uni", 2), ("gru", "bi", 2), ("tanh", "uni", 1)]:
        insize, hsize = 6, 5
        entries, wsize = cudnnRnnLayout(mode, insize, hsize, layers, direction)

        rng = np.random.RandomState(3)
        cudnnBlob = rng.randn(wsize).astype(np.float32)

        native = convertRnnWeights(cudnnBlob, mode, insize, hsize, layers, direction, source="cudnn")
        back = convertRnnWeights(native, mode, insize, hsize, layers, direction, source="native")
        assert np.array_equal(back, cudnnBlob), (mode, direction)

        # named views of the converted blob match slices of the cuDNN blob
        desc = RnnDesc(insize, hsize, layers, mode, direction)
        for layer, name, offset, shape in entries:
            count = int(np.prod(shape))
            expect = cudnnBlob[offset:offset + count].reshape(shape)

            nOffset, nShape = desc.layout[layer][name]
            got = native[nOffset:nOffset + count].reshape(nShape)
            assert np.array_equal(got, expect), (mode, layer, name)


def testEngineMany(tmp_path):
    """Engine.many(K stacked batches) in one dispatch == K eager calls."""
    import numpy as np
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.converter.engine import buildEngine, Engine

    np.random.seed(20)
    net = Sequential(name="manynet")
    net.append(Linear(6, 12)).append(Activation(relu)).append(Linear(12, 4))

    buildEngine(net, (2, 6), str(tmp_path), returnEngine=False)
    engine = Engine(str(tmp_path / "manynet.float32.engine"))

    stacked = np.random.randn(5, 2, 6).astype(np.float32)

    grouped = engine.many(gpuarray.to_gpu(stacked)).get()
    assert grouped.shape == (5, 2, 4)

    for i in range(5):
        single = engine(gpuarray.to_gpu(stacked[i])).get()
        assert np.allclose(grouped[i], single, atol=1e-5)
        engine.reset()

    # steps= runs a prefix of the stack
    prefix = engine.many(gpuarray.to_gpu(stacked), steps=3).get()
    assert prefix.shape == (3, 2, 4) and np.allclose(prefix, grouped[:3], atol=1e-6)


def testEngineManyRepeat(tmp_path):
    """Engine.manyRepeat(batch, K) == K eager calls on the same batch, with
    the batch resident ONCE (no (K, batch, ...) stack in HBM)."""
    import numpy as np
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.converter.engine import buildEngine, Engine

    np.random.seed(21)
    net = Sequential(name="repnet")
    net.append(Linear(6, 12)).append(Activation(relu)).append(Linear(12, 4))

    buildEngine(net, (3, 6), str(tmp_path), returnEngine=False)
    engine = Engine(str(tmp_path / "repnet.float32.engine"))

    batch = np.random.randn(3, 6).astype(np.float32)
    single = engine(gpuarray.to_gpu(batch)).get()
    engine.reset()

    grouped = engine.manyRepeat(gpuarray.to_gpu(batch), steps=4).get()
    assert grouped.shape == (4, 3, 4)
    for i in range(4):
        assert np.allclose(grouped[i], single, atol=1e-5)
