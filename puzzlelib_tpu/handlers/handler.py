"""Batching engine.

API parity target: /root/reference/Handlers/Handler.py.  Two staging tiers:
``handleFromHost`` slices host arrays into macro-batches and uploads each to
the device in one transfer (host RAM -> HBM), then ``handle`` walks shuffled
mini-batches of the resident macro-batch — the out-of-core pattern that keeps
the TPU fed without holding the whole dataset in HBM.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray


class Handler:
    def __init__(self, mod, onBatchFinish=None, batchsize=128):
        self.module = mod

        self.batchsize = batchsize
        self.onBatchFinish = onBatchFinish

        self.currBatch, self.totalBatches = 0, 0
        self.currMacroBatch, self.totalMacroBatches = 0, 0

    # -- tiling helpers ----------------------------------------------------------

    @staticmethod
    def _tileCount(datasize, tilesize):
        return -(-datasize // tilesize)

    @staticmethod
    def _tileOrder(count, shuffled):
        return np.random.permutation(count) if shuffled else np.arange(count)

    @staticmethod
    def getDataSize(data):
        head = data
        while isinstance(head, list):
            head = head[0]

        return head.shape[0]

    @classmethod
    def sliceData(cls, data, idx, batchsize, postSlice):
        if isinstance(data, list):
            return [cls.sliceData(item, idx, batchsize, postSlice) for item in data]

        start = idx * batchsize
        return postSlice(data[start:start + batchsize])

    @classmethod
    def parseShapeTree(cls, data, onData, auxdata=None):
        if not isinstance(data, list):
            return onData(data, auxdata) if auxdata is not None else onData(data)

        aux = [None] * len(data) if auxdata is None else auxdata
        return [cls.parseShapeTree(item, onData, a) for item, a in zip(data, aux)]

    # -- staging loops --------------------------------------------------------------

    def handleFromHost(self, data, state=None, macroBatchSize=10000, onMacroBatchFinish=None, random=True):
        self.totalMacroBatches = self._tileCount(self.getDataSize(data), macroBatchSize)

        for ordinal, n in enumerate(self._tileOrder(self.totalMacroBatches, random), start=1):
            staged = self.sliceData(data, n, macroBatchSize, postSlice=gpuarray.to_gpu)
            self.currMacroBatch = ordinal

            self.onMacroBatchStart(n, macroBatchSize, state)
            self.handle(staged, state, random=random)
            self.onMacroBatchFinish(n, macroBatchSize, state)

            if onMacroBatchFinish is not None:
                onMacroBatchFinish(self)

    def handle(self, data, state=None, random=True):
        self.totalBatches = self._tileCount(self.getDataSize(data), self.batchsize)

        for ordinal, n in enumerate(self._tileOrder(self.totalBatches, random), start=1):
            batch = self.sliceData(data, n, self.batchsize, postSlice=lambda view: view)
            self.currBatch = ordinal

            self.handleBatch(batch, n, state)
            self.module.reset()

            if self.onBatchFinish is not None:
                self.onBatchFinish(self)

    # -- subclass surface --------------------------------------------------------------

    def onMacroBatchStart(self, idx, macroBatchSize, state):
        pass

    def onMacroBatchFinish(self, idx, macroBatchSize, state):
        pass

    def handleBatch(self, batch, idx, state):
        raise NotImplementedError()
