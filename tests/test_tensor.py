import numpy as np

from puzzlelib_tpu.backend import gpuarray


def testRoundTrip():
    host = np.random.randn(4, 5).astype(np.float32)
    dev = gpuarray.to_gpu(host)

    assert dev.shape == (4, 5) and dev.dtype == np.float32
    assert np.allclose(dev.get(), host)


def testSetFill():
    dev = gpuarray.zeros((3, 3), np.float32)
    dev.fill(2.5)
    assert np.allclose(dev.get(), 2.5)

    host = np.random.randn(3, 3).astype(np.float32)
    dev.set(host)
    assert np.allclose(dev.get(), host)


def testWriteThroughReshapeView():
    host = np.arange(12, dtype=np.float32)
    base = gpuarray.to_gpu(host)

    view = base.reshape(3, 4)
    view[1, 1] = 100.0

    assert base.get()[5] == 100.0

    # writes to base propagate to views
    base.fill(1.0)
    assert np.allclose(view.get(), 1.0)


def testRavelWriteThrough():
    base = gpuarray.zeros((4, 4), np.float32)
    flat = base.ravel()

    flat += 3.0
    assert np.allclose(base.get(), 3.0)


def testIndexViewWriteThrough():
    base = gpuarray.zeros((10, ), np.float32)
    sub = base[2:5]

    sub.fill(7.0)

    expected = np.zeros(10, np.float32)
    expected[2:5] = 7.0
    assert np.allclose(base.get(), expected)


def testChainedViews():
    base = gpuarray.zeros((16, ), np.float32)
    block = base[4:8].reshape(2, 2)

    block.fill(5.0)

    assert np.allclose(base.get()[4:8], 5.0)
    assert np.allclose(base.get()[:4], 0.0)


def testAliasingStability():
    # module caches var.data object; optimizer mutates it in place
    w = gpuarray.to_gpu(np.zeros(4, np.float32))
    cached = w

    w += 1.0
    assert np.allclose(cached.get(), 1.0)


def testArithmetic():
    a = gpuarray.to_gpu(np.array([1.0, 2.0], np.float32))
    b = gpuarray.to_gpu(np.array([3.0, 4.0], np.float32))

    assert np.allclose((a + b).get(), [4.0, 6.0])
    assert np.allclose((a * b).get(), [3.0, 8.0])
    assert np.allclose((b - a).get(), [2.0, 2.0])
    assert np.allclose((a * 2).get(), [2.0, 4.0])


def testSharedArray():
    sh = gpuarray.SharedArray(np.float32)

    sh.register((2, 3), np.float32, "a")
    sh.register((4, ), np.float32, "b")
    sh.build()

    a, b = sh["a"], sh["b"]
    assert a.shape == (2, 3) and b.shape == (4, )

    a.fill(1.0)
    b.fill(2.0)

    flat = sh.ary.get()
    assert flat[:6].sum() == 6.0
    assert flat[8:12].sum() == 8.0  # block "b" starts at the 16-byte aligned offset

    # a fused write on the flat array is visible in the views
    sh.ary += 1.0
    assert np.allclose(a.get(), 2.0)
    assert np.allclose(b.get(), 3.0)


def testConcatenateSplitTile():
    a = gpuarray.to_gpu(np.ones((2, 3), np.float32))
    b = gpuarray.to_gpu(np.full((2, 2), 2.0, np.float32))

    cat = gpuarray.concatenate((a, b), axis=1)
    assert cat.shape == (2, 5)

    parts = gpuarray.split(cat, (3, 2), axis=1)
    assert np.allclose(parts[0].get(), 1.0) and np.allclose(parts[1].get(), 2.0)

    tiled = gpuarray.tile(a, 3, axis=0)
    assert tiled.shape == (6, 3)


def testRngFill():
    data = gpuarray.empty((1000, ), np.float32)

    gpuarray.fillUniform(data, 0.0, 1.0)
    vals = data.get()
    assert vals.min() >= 0.0 and vals.max() <= 1.0 and 0.2 < vals.mean() < 0.8

    gpuarray.fillNormal(data, 0.0, 1.0)
    assert abs(data.get().mean()) < 0.3


def testTraceMallocTier():
    """Alloc-trace tier: live-allocation registry with caller attribution and
    leak count (TraceMalloc equivalent; reference Compiler/Codegen/Malloc)."""
    import gc

    from puzzlelib_tpu import profiler
    from puzzlelib_tpu.backend import gpuarray

    profiler.startTraceMalloc()
    try:
        a = gpuarray.empty((4, 4))
        b = gpuarray.zeros((8, ))
        c = gpuarray.to_gpu(np.ones((2, 2), np.float32))
        assert profiler.traceLeaks() == 3

        del b
        gc.collect()
        assert profiler.traceLeaks() == 2

        report = profiler.liveAllocations()
        assert report[0][0] == 64 and report[0][1] == (4, 4)
        assert "test_tensor" in report[0][3]
        assert "64" in profiler.formatAllocReport()
    finally:
        final = profiler.stopTraceMalloc()

    assert len(final) == 2

    d = gpuarray.empty((4, ))
    assert profiler.traceLeaks() == 2, "tracing recorded while stopped"
    del a, c, d
