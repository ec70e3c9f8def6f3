"""IMDB sentiment loader with vocabulary build
(reference: /root/reference/Datasets/IMDBLoader.py)."""

import os
import json

import numpy as np
import h5py

from puzzlelib_tpu.datasets.dataloader import DataLoader


class IMDBLoader(DataLoader):
    def __init__(self, numwords=None, skiptop=0, maxlen=None, padchar=0, startchar=1, oovchar=2, indexFrom=3):
        super().__init__(("data", "labels", "vocabulary"), "imdb.hdf")

        self.numwords = numwords
        self.skiptop = skiptop
        self.maxlen = maxlen
        self.padchar = padchar
        self.startchar = startchar
        self.oovchar = oovchar
        self.indexFrom = indexFrom

        self.datafile = "imdb.npz"
        self.indexfile = "imdb_word_index.json"

    _paramNames = ["numwords", "skiptop", "maxlen", "padchar", "startchar", "oovchar", "indexFrom"]

    def checkCacheParams(self, log=True):
        if os.path.exists(self.cachename):
            with h5py.File(self.cachename, "r") as hdf:
                params = json.loads(str(np.array(hdf["params"], dtype=str)))

                for paramName in self._paramNames:
                    if params[paramName] != getattr(self, paramName):
                        if log:
                            print("[%s] Existing cache has different param '%s', clearing ..." %
                                  (self.__class__.__name__, paramName))
                        return False

        return True

    def loadVocabulary(self, path):
        with open(os.path.join(path, self.indexfile)) as f:
            d = json.load(f)

        dt = h5py.special_dtype(vlen=str)
        vocab = np.empty(shape=(self.numwords, ), dtype=dt)

        for word, idx in d.items():
            if idx < self.numwords:
                vocab[int(idx)] = word

        return vocab

    def load(self, path, compress="gzip", log=True):
        self.cachename = os.path.join(path, self.cachename)

        if not self.checkCacheParams(log):
            self.clear()

        if not os.path.exists(self.cachename):
            if log:
                print("[%s] Started unpacking ..." % self.__class__.__name__)

            with np.load(os.path.join(path, self.datafile), allow_pickle=True) as f:
                traindata, testdata = f["x_train"], f["x_test"]
                trainlabels, testlabels = f["y_train"], f["y_test"]

            trainperm = np.random.permutation(traindata.shape[0])
            testperm = np.random.permutation(testdata.shape[0])

            traindata, trainlabels = traindata[trainperm], trainlabels[trainperm]
            testdata, testlabels = testdata[testperm], testlabels[testperm]

            data = np.concatenate([traindata, testdata])
            labels = np.concatenate([trainlabels, testlabels])

            if self.startchar is not None:
                data = [[self.startchar] + [w + self.indexFrom for w in sample] for sample in data]
            elif self.indexFrom:
                data = [[w + self.indexFrom for w in sample] for sample in data]

            if self.numwords is None:
                self.numwords = max(max(sample) for sample in data)

            if log:
                print("[%s] Started truncating vocabulary (%s max) ..." % (self.__class__.__name__, self.numwords))

            if self.oovchar is not None:
                data = [[self.oovchar if (w >= self.numwords or w < self.skiptop) else w for w in sample]
                        for sample in data]
            else:
                truncdata = []
                for sample in data:
                    truncsample = [w for w in sample if self.skiptop <= w < self.numwords]
                    truncdata.append([self.padchar] * (len(sample) - len(truncsample)) + truncsample)

                data = truncdata

            if log:
                print("[%s] Started adjusting samples length (%s max) ..." % (self.__class__.__name__, self.maxlen))

            if self.maxlen is None:
                self.maxlen = max(len(sample) for sample in data)

            adjdata = []
            for sample in data:
                if len(sample) < self.maxlen:
                    adjdata.append([self.padchar] * (self.maxlen - len(sample)) + list(sample))
                else:
                    adjdata.append(list(sample[-self.maxlen:]))

            vocab = self.loadVocabulary(path)
            data, labels = np.array(adjdata, dtype=np.int32), np.array(labels, dtype=np.int32)

            with h5py.File(self.cachename, "w") as hdf:
                dsetname, lblsetname, vocsetname = self.datanames

                hdf.create_dataset(dsetname, data=data, compression=compress)
                hdf.create_dataset(lblsetname, data=labels, compression=compress)
                hdf.create_dataset(vocsetname, data=vocab, compression=compress)

                params = json.dumps({name: getattr(self, name) for name in self._paramNames})
                hdf.create_dataset("params", (), dtype=h5py.special_dtype(vlen=str), data=params)

        hdf = h5py.File(self.cachename, "r")
        dsetname, lblsetname, vocsetname = self.datanames
        return hdf[dsetname], hdf[lblsetname], hdf[vocsetname]
