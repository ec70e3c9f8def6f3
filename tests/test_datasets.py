import io
import json
import os
import struct
import tarfile
import zipfile

import numpy as np
import pytest

from PIL import Image


def _writePng(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="png")
    return buf.getvalue()


def testZipAndTarLoaders(tmp_path):
    from puzzlelib_tpu.datasets import ZipLoader, TarLoader

    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, size=(8, 8, 3), dtype=np.uint8) for _ in range(6)]

    zippath = str(tmp_path / "test.zip")
    with zipfile.ZipFile(zippath, "w") as zf:
        for i, img in enumerate(images):
            zf.writestr("img%d.png" % i, _writePng(img))

    loader = ZipLoader(cachename=str(tmp_path / "zipcache.hdf"))
    data = loader.load(zippath, log=False)

    assert data.shape == (6, 3, 8, 8)

    tarpath = str(tmp_path / "test.tar")
    with tarfile.open(tarpath, "w") as tf:
        for i, img in enumerate(images):
            payload = _writePng(img)
            info = tarfile.TarInfo("img%d.png" % i)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

    loader = TarLoader(cachename=str(tmp_path / "tarcache.hdf"))
    data = loader.load(tarpath, log=False)
    assert data.shape == (6, 3, 8, 8)


def testPathLoader(tmp_path):
    from puzzlelib_tpu.datasets import PathLoader

    rng = np.random.RandomState(1)

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()

    for i in range(4):
        Image.fromarray(rng.randint(0, 255, size=(8, 8, 3), dtype=np.uint8)).save(str(imgdir / ("%d.png" % i)))

    loader = PathLoader(cachename=str(tmp_path / "pathcache.hdf"))
    data = loader.load(str(imgdir), log=False)

    assert data.shape == (4, 3, 8, 8)


def testMnistLoader(tmp_path):
    from puzzlelib_tpu.datasets import MnistLoader

    rng = np.random.RandomState(2)

    def writeImages(path, n):
        with open(path, "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(rng.randint(0, 255, size=(n, 28, 28), dtype=np.uint8).tobytes())

    def writeLabels(path, n):
        with open(path, "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(rng.randint(0, 10, size=(n, ), dtype=np.uint8).tobytes())

    writeImages(str(tmp_path / "t10k-images.idx3-ubyte"), 5)
    writeLabels(str(tmp_path / "t10k-labels.idx1-ubyte"), 5)
    writeImages(str(tmp_path / "train-images.idx3-ubyte"), 10)
    writeLabels(str(tmp_path / "train-labels.idx1-ubyte"), 10)

    loader = MnistLoader()
    data, labels = loader.load(path=str(tmp_path), log=False)

    assert data.shape == (15, 1, 28, 28)
    assert labels.shape == (15, )
    assert float(np.max(data)) <= 1.0


def testCifar10Loader(tmp_path):
    import pickle

    from puzzlelib_tpu.datasets import Cifar10Loader

    rng = np.random.RandomState(3)

    tarpath = str(tmp_path / "cifar-10-python.tar")
    with tarfile.open(tarpath, "w") as tf:
        for name in ("data_batch_1", "test_batch"):
            payload = pickle.dumps({
                "data": rng.randint(0, 255, size=(4, 3072), dtype=np.uint8),
                "labels": list(rng.randint(0, 10, size=(4, ))),
            })
            info = tarfile.TarInfo("cifar-10-batches-py/%s" % name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))

    loader = Cifar10Loader()
    data, labels = loader.load(path=str(tmp_path), log=False)

    assert data.shape == (8, 3, 32, 32)
    assert labels.shape == (8, )


def testIMDBLoader(tmp_path):
    from puzzlelib_tpu.datasets import IMDBLoader

    rng = np.random.RandomState(4)

    sequences = [list(rng.randint(0, 40, size=(rng.randint(3, 10), ))) for _ in range(8)]
    labels = rng.randint(0, 2, size=(8, ))

    np.savez(str(tmp_path / "imdb.npz"),
             x_train=np.array(sequences[:6], dtype=object),
             y_train=labels[:6],
             x_test=np.array(sequences[6:], dtype=object),
             y_test=labels[6:])

    with open(str(tmp_path / "imdb_word_index.json"), "w") as f:
        json.dump({"word%d" % i: i for i in range(50)}, f)

    loader = IMDBLoader(numwords=50, maxlen=12)
    data, lbls, vocab = loader.load(path=str(tmp_path), log=False)

    assert data.shape == (8, 12)
    assert lbls.shape == (8, )
    assert vocab.shape == (50, )


def testSmallNorbLoader(tmp_path):
    import struct
    from puzzlelib_tpu.datasets import SmallNorbLoader

    rng = np.random.RandomState(5)

    def writeMat(name, magic, arr, ndim):
        dims = arr.shape[:ndim]
        with open(str(tmp_path / name), "wb") as f:
            f.write(struct.pack("<ii", magic, ndim))
            padded = tuple(dims) + (1, ) * max(0, 3 - ndim)
            f.write(struct.pack("<" + "i" * len(padded), *padded))
            f.write(arr.tobytes())

    # tiny NORB-format fixtures: 3 stereo samples of 8x8 per split
    # (binary layout per the reference loader's magic/dims header,
    # /root/reference/Datasets/SmallNorbLoader.py)
    loader = SmallNorbLoader(onSample=lambda s: s,
                             sampleInfo=lambda: (np.float32, (8, 8)))

    for dataName, lblName, infoName in ((loader.traindata, loader.trainlabels, loader.traininfo),
                                        (loader.testdata, loader.testlabels, loader.testinfo)):
        data = rng.randint(0, 255, size=(3, 2, 8, 8)).astype(np.uint8)
        writeMat(dataName, 0x1E3D4C55, data, 4)
        writeMat(lblName, 0x1E3D4C54, rng.randint(0, 5, size=(3, )).astype(np.uint32), 1)
        info = np.stack([np.arange(3, dtype=np.uint32),          # instance
                         rng.randint(0, 9, size=3).astype(np.uint32),
                         (2 * rng.randint(0, 18, size=3)).astype(np.uint32),
                         rng.randint(0, 6, size=3).astype(np.uint32)], axis=1)
        writeMat(infoName, 0x1E3D4C54, info, 2)

    data, labels, info = loader.load(path=str(tmp_path), log=False)

    assert data.shape == (6, 2, 8, 8)           # train + test stacked
    assert labels.shape == (6, )
    assert info.shape == (6, 4)
    assert (np.asarray(labels) < 5).all()

    # second load comes from the HDF5 cache (no re-parse)
    assert (tmp_path / "smallnorb.hdf").exists()
    data2, _, _ = SmallNorbLoader(onSample=lambda s: s,
                                  sampleInfo=lambda: (np.float32, (8, 8))).load(
        path=str(tmp_path), log=False)
    assert np.allclose(np.asarray(data), np.asarray(data2), atol=0)

    # corrupted magic is rejected
    writeMat("bad.mat", 0x12345678, np.zeros((1, 1, 1), np.uint8), 3)
    with pytest.raises(ValueError):
        SmallNorbLoader._readMat(str(tmp_path / "bad.mat"), 0x1E3D4C55)
