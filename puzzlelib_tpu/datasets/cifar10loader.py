"""CIFAR-10 tar loader with HDF5 cache (reference: /root/reference/Datasets/Cifar10Loader.py)."""

import os
import tarfile
import pickle

import numpy as np
import h5py

from puzzlelib_tpu.datasets.dataloader import DataLoader


class Cifar10Loader(DataLoader):
    def __init__(self, onSample=None, onSampleBatch=None, cachename="cifar10.hdf"):
        super().__init__(("data", "labels"), cachename)

        self.onSample = onSample if onSample else \
            (lambda smp: smp.reshape(3, 32, 32).astype(np.float32) * 2.0 / 255.0 - 1.0)

        self.onSampleBatch = onSampleBatch if onSampleBatch else \
            (lambda smp, b: smp.reshape(b, 3, 32, 32).astype(np.float32) * 2.0 / 255.0 - 1.0)

        self.datafiles = ["cifar-10-python.tar.gz", "cifar-10-python.tar"]

    def load(self, path, compress="gzip", log=True):
        self.cachename = os.path.join(path, self.cachename)

        filename = None
        for datafile in self.datafiles:
            candidate = os.path.join(path, datafile)
            if os.path.exists(candidate) and tarfile.is_tarfile(candidate):
                filename = candidate
                break

        if filename is None and not os.path.exists(self.cachename):
            raise ValueError("No proper datafile found in path %s (searched for %s)" % (path, self.datafiles))

        if not os.path.exists(self.cachename):
            dicts = []

            with tarfile.open(filename) as tar:
                for name in tar.getnames():
                    if "data_batch" in name or "test_batch" in name:
                        dicts.append(pickle.load(tar.extractfile(name), encoding="latin1"))

                        if log:
                            print("[%s] Unpacked %s" % (self.__class__.__name__, name))

            totallen = sum(len(d["labels"]) for d in dicts)

            images = np.empty((totallen, 3, 32, 32), dtype=np.float32)
            labels = np.empty((totallen, ), dtype=np.int32)

            idx = 0
            for i, d in enumerate(dicts):
                data, lbls = d["data"], d["labels"]

                images[idx:idx + data.shape[0]] = self.onSampleBatch(data, data.shape[0])
                labels[idx:idx + len(lbls)] = lbls
                idx += data.shape[0]

                if log:
                    print("[%s] Merged #%d batch out of %d" % (self.__class__.__name__, i + 1, len(dicts)))

            with h5py.File(self.cachename, "w") as hdf:
                dsetname, lblsetname = self.datanames
                hdf.create_dataset(dsetname, data=images, compression=compress)
                hdf.create_dataset(lblsetname, data=labels, compression=compress)

        hdf = h5py.File(self.cachename, "r")
        dsetname, lblsetname = self.datanames
        return hdf[dsetname], hdf[lblsetname]
