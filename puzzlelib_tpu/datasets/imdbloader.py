"""IMDB sentiment loader with vocabulary build.

API parity target: /root/reference/Datasets/IMDBLoader.py — parses the
``imdb.npz`` + ``imdb_word_index.json`` pair, re-tokenizes with start/oov
markers, truncates the vocabulary, left-pads to fixed length and caches the
int32 tensors (+ parameters) in HDF5.
"""

import os
import json

import numpy as np
import h5py

from puzzlelib_tpu.datasets.dataloader import DataLoader

_PARAMS = ("numwords", "skiptop", "maxlen", "padchar", "startchar", "oovchar", "indexFrom")


class IMDBLoader(DataLoader):
    def __init__(self, numwords=None, skiptop=0, maxlen=None, padchar=0, startchar=1, oovchar=2, indexFrom=3):
        super().__init__(("data", "labels", "vocabulary"), "imdb.hdf")

        self.numwords, self.skiptop, self.maxlen = numwords, skiptop, maxlen
        self.padchar, self.startchar, self.oovchar = padchar, startchar, oovchar
        self.indexFrom = indexFrom

        self.datafile = "imdb.npz"
        self.indexfile = "imdb_word_index.json"

    _paramNames = list(_PARAMS)

    def _paramsDict(self):
        return {name: getattr(self, name) for name in _PARAMS}

    def checkCacheParams(self, log=True):
        if not os.path.exists(self.cachename):
            return True

        with h5py.File(self.cachename, "r") as hdf:
            cached = json.loads(str(np.array(hdf["params"], dtype=str)))

        for name, value in self._paramsDict().items():
            if cached[name] != value:
                if log:
                    print("[%s] Existing cache has different param '%s', clearing ..." %
                          (type(self).__name__, name))
                return False

        return True

    def loadVocabulary(self, path):
        with open(os.path.join(path, self.indexfile)) as f:
            index = json.load(f)

        vocab = np.empty((self.numwords, ), dtype=h5py.special_dtype(vlen=str))
        for word, idx in index.items():
            if idx < self.numwords:
                vocab[int(idx)] = word

        return vocab

    # -- tokenization pipeline ------------------------------------------------------

    def _retokenize(self, samples):
        """Shift word ids by indexFrom and optionally prepend the start marker."""
        if self.startchar is not None:
            return [[self.startchar] + [w + self.indexFrom for w in s] for s in samples]

        if self.indexFrom:
            return [[w + self.indexFrom for w in s] for s in samples]

        return samples

    def _clampVocab(self, samples):
        """Replace (or drop) words outside [skiptop, numwords)."""
        inVocab = lambda w: self.skiptop <= w < self.numwords

        if self.oovchar is not None:
            return [[w if inVocab(w) else self.oovchar for w in s] for s in samples]

        clamped = []
        for s in samples:
            kept = [w for w in s if inVocab(w)]
            clamped.append([self.padchar] * (len(s) - len(kept)) + kept)

        return clamped

    def _fitLength(self, samples):
        """Left-pad short samples, keep the tail of long ones."""
        fitted = []
        for s in samples:
            if len(s) >= self.maxlen:
                fitted.append(list(s[-self.maxlen:]))
            else:
                fitted.append([self.padchar] * (self.maxlen - len(s)) + list(s))

        return fitted

    # -- main entry ---------------------------------------------------------------------

    def _buildCache(self, path, compress, log):
        if log:
            print("[%s] Started unpacking ..." % type(self).__name__)

        with np.load(os.path.join(path, self.datafile), allow_pickle=True) as f:
            parts = [(f["x_train"], f["y_train"]), (f["x_test"], f["y_test"])]

        shuffled = []
        for samples, labels in parts:
            perm = np.random.permutation(samples.shape[0])
            shuffled.append((samples[perm], labels[perm]))

        data = np.concatenate([s for s, _ in shuffled])
        labels = np.concatenate([l for _, l in shuffled])

        data = self._retokenize(data)

        if self.numwords is None:
            self.numwords = max(max(s) for s in data)

        if log:
            print("[%s] Started truncating vocabulary (%s max) ..." % (type(self).__name__, self.numwords))
        data = self._clampVocab(data)

        if self.maxlen is None:
            self.maxlen = max(len(s) for s in data)

        if log:
            print("[%s] Started adjusting samples length (%s max) ..." % (type(self).__name__, self.maxlen))
        data = self._fitLength(data)

        vocab = self.loadVocabulary(path)

        with h5py.File(self.cachename, "w") as hdf:
            for setname, tensor in zip(self.datanames, (np.array(data, dtype=np.int32),
                                                        np.array(labels, dtype=np.int32), vocab)):
                hdf.create_dataset(setname, data=tensor, compression=compress)

            hdf.create_dataset("params", (), dtype=h5py.special_dtype(vlen=str),
                               data=json.dumps(self._paramsDict()))

    def load(self, path, compress="gzip", log=True):
        self.cachename = os.path.join(path, self.cachename)

        if not self.checkCacheParams(log):
            self.clear()

        if not os.path.exists(self.cachename):
            self._buildCache(path, compress, log)

        hdf = h5py.File(self.cachename, "r")
        return tuple(hdf[setname] for setname in self.datanames)
