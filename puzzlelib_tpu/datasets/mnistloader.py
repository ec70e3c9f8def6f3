"""MNIST idx-format loader with HDF5 cache (reference: /root/reference/Datasets/MnistLoader.py)."""

import os
import struct

import numpy as np
import h5py

from puzzlelib_tpu.datasets.dataloader import DataLoader


class MnistLoader(DataLoader):
    def __init__(self, onSample=None, cachename="mnist.hdf"):
        super().__init__(("data", "labels"), cachename)

        self.onSample = onSample if onSample else \
            (lambda smp: np.asarray(smp, dtype=np.float32).reshape((1, 28, 28)) / 255.0)

        self.testdata = "t10k-images.idx3-ubyte"
        self.testlabels = "t10k-labels.idx1-ubyte"
        self.traindata = "train-images.idx3-ubyte"
        self.trainlabels = "train-labels.idx1-ubyte"

    def _readLabels(self, filename):
        with open(filename, "rb") as file:
            magic, size = struct.unpack(">II", file.read(8))
            if magic != 2049:
                raise ValueError("Bad magic number (got %s, expected 2049)" % magic)

            return np.frombuffer(file.read(), dtype=np.uint8)

    def _readImages(self, filename):
        with open(filename, "rb") as file:
            magic, size, rows, cols = struct.unpack(">IIII", file.read(16))
            if magic != 2051:
                raise ValueError("Bad magic number (got %s, expected 2051)" % magic)

            raw = np.frombuffer(file.read(), dtype=np.uint8)
            return raw.reshape(size, rows, cols)

    def load(self, path, compress="gzip", log=True):
        self.cachename = os.path.join(path, self.cachename)

        if not os.path.exists(self.cachename):
            if log:
                print("[%s] Started unpacking ..." % self.__class__.__name__)

            lbls = np.concatenate([
                self._readLabels(os.path.join(path, f)) for f in (self.testlabels, self.trainlabels)
            ])
            imgs = np.concatenate([
                self._readImages(os.path.join(path, f)) for f in (self.testdata, self.traindata)
            ])

            if log:
                print("[%s] Building cache ..." % self.__class__.__name__)

            images = np.stack([self.onSample(img) for img in imgs]).astype(np.float32)
            labels = lbls.astype(np.int32)

            with h5py.File(self.cachename, "w") as hdf:
                dsetname, lblsetname = self.datanames
                hdf.create_dataset(dsetname, data=images, compression=compress)
                hdf.create_dataset(lblsetname, data=labels, compression=compress)

        hdf = h5py.File(self.cachename, "r")
        dsetname, lblsetname = self.datanames
        return hdf[dsetname], hdf[lblsetname]
