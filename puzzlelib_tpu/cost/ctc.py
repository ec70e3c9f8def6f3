"""CTC cost (reference: /root/reference/Cost/CTC.py)."""

import numpy as np

from puzzlelib_tpu.backend.kernels.costs import ctcLoss, ctcLossTest
from puzzlelib_tpu.cost.cost import Cost


class CTC(Cost):
    def __init__(self, blank, vocabsize=None, normalized=False):
        super().__init__()

        self.normalized = normalized

        if vocabsize is not None:
            assert 0 <= blank <= vocabsize

        self.vocabsize = vocabsize
        self.blank = blank

    def calcGrad(self, pred, target):
        data, datalen = pred
        labels, lengths = target

        self.devErr.fill(0.0)
        _, grad = ctcLoss(data, datalen, labels, lengths, self.blank, error=self.devErr,
                          normalized=self.normalized)

        return grad

    def calcError(self, scores, labels):
        self.accumErr += self.devErr

    def calcVal(self, pred, target):
        raise NotImplementedError()

    def checkDataShape(self, pred, target):
        data, datalen = pred
        labels, lengths = target

        assert datalen.dtype == labels.dtype and labels.dtype == lengths.dtype and lengths.dtype == np.int32
        assert datalen.shape[0] == lengths.shape[0] and lengths.shape[0] == data.shape[1]

        if self.vocabsize is not None:
            assert data.shape[2] == self.vocabsize

    def checkValDataShape(self, pred, target):
        pass

    def getBatchsize(self, pred):
        return pred[0].shape[1]
