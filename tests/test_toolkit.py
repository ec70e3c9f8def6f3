import numpy as np

from puzzlelib_tpu.backend import gpuarray


def testConvertToGraphMatchesNet():
    from puzzlelib_tpu.containers import Sequential, Parallel
    from puzzlelib_tpu.modules import Linear, Activation, relu, Replicate, Concat
    from puzzlelib_tpu.passes import toGraph

    np.random.seed(0)

    net = Sequential()
    net.append(Linear(16, 8, name="l1"))
    net.append(Activation(relu, name="a1"))
    net.append(Replicate(times=2, name="rep"))
    net.append(Parallel().append(Linear(8, 4, name="l2")).append(Linear(8, 3, name="l3")))
    net.append(Concat(axis=1, name="cat"))

    data = gpuarray.to_gpu(np.random.randn(4, 16).astype(np.float32))
    outdata = net(data)
    net.reset()

    graph = toGraph(net)
    graphdata = graph(data)

    assert np.allclose(outdata.get(), graphdata.get(), atol=1e-6)

    grad = gpuarray.to_gpu(np.random.randn(4, 7).astype(np.float32))
    graph.backward(grad)
    assert graph.grad.shape == (4, 16)


def testStatistics():
    from puzzlelib_tpu import statistics as Statistics

    labels = [0, 0, 1, 1, 2]
    preds = [0, 1, 1, 1, 2]

    cm = Statistics.confusion(labels, preds, log=False)
    assert cm[0][0] == 1 and cm[0][1] == 1

    acc = Statistics.accuracy(cm, log=False)
    assert np.isclose(acc, 0.8)

    pr, _ = Statistics.precision(cm, log=False)
    rc, _ = Statistics.recall(cm, log=False)
    assert 0 < pr <= 1 and 0 < rc <= 1


def testVisualFilters(tmp_path):
    from puzzlelib_tpu.visual import showFilters, showImage, whiten

    filters = np.random.randn(8, 3, 5, 5).astype(np.float32)
    showFilters(filters, str(tmp_path / "filters.png"))
    assert (tmp_path / "filters.png").exists()

    img = np.random.rand(3, 16, 16).astype(np.float32)
    showImage(img, str(tmp_path / "img.png"))
    assert (tmp_path / "img.png").exists()

    batch = np.random.randn(4, 3, 8, 8).astype(np.float32)
    white = whiten(batch.copy())
    assert white.shape == batch.shape


def testBoardRender(tmp_path):
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, relu
    from puzzlelib_tpu.board import drawBoard

    net = Sequential(name="testnet")
    net.append(Linear(4, 4, name="l1"))
    net.append(Activation(relu, name="a1"))

    try:
        drawBoard(net, str(tmp_path / "net.gv"), view=False)
    except Exception as e:
        # rendering requires the dot binary; generating the source must work
        import graphviz
        if not isinstance(e, graphviz.backend.execute.ExecutableNotFound):
            raise


def testTransformersPipeline():
    from puzzlelib_tpu.transformers import Serial, Merger, Generator, Transformer

    data = np.random.randn(20, 3, 4, 4).astype(np.float32)

    with Serial(data) as serial:
        for _ in range(3):
            serial.prepareData(chunksize=8)
            chunk = serial.getData()
            assert chunk.shape == (8, 3, 4, 4)

    d1 = np.random.randn(10, 3, 4, 4).astype(np.float32)
    d2 = np.random.randn(6, 3, 4, 4).astype(np.float32)

    with Merger([d1, d2], [0, 1]) as merger:
        merger.prepareData(chunksize=8, ratios=[1, 1], permutate=False)
        chunk, labels = merger.getData()
        assert chunk.shape[0] == 8 and labels.shape[0] == 8

    class Gen(Transformer):
        def __call__(self, batch, threadidx):
            return np.random.randn(5, 2, 2, 2).astype(np.float32)

    with Generator(numofthreads=4) as generator:
        generator.addTransformer(Gen())
        generator.prepareData()
        assert generator.getData().shape == (20, 2, 2, 2)


def testDatasetUtils():
    from puzzlelib_tpu.datasets.utils import splitData, replicateData, permutateData

    np.random.seed(0)
    data = np.random.randn(100, 4).astype(np.float32)
    labels = np.random.randint(0, 3, size=(100, )).astype(np.int32)

    trainData, valData, trainLabels, valLabels = splitData(data.copy(), labels.copy())
    assert len(trainData) + len(valData) == 100
    assert len(trainLabels) == len(trainData)

    newData, newLabels = replicateData(data.copy(), labels.copy())
    counts = np.bincount(newLabels)
    assert counts.max() - counts.min() <= counts.max() * 0.15
