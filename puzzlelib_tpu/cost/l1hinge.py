"""Pairwise L1-hinge embedding cost (reference: /root/reference/Cost/L1Hinge.py)."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import absKer
from puzzlelib_tpu.backend.kernels.costs import l1HingeKer, getAccuracyKernel

from puzzlelib_tpu.cost.cost import CostError, Cost


class L1Hinge(Cost):
    def calcGrad(self, pair, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        g1 = gpuarray.empty(pair[0].shape, dtype=np.float32, allocator=memPool)
        g2 = gpuarray.empty(pair[1].shape, dtype=np.float32, allocator=memPool)

        self.devErr.fill(0.0)
        l1HingeKer(pair[0], pair[1], labels, self.devErr, g1, g2, pair[0].shape[0], pair[0].shape[1])

        return [g1, g2]

    def calcError(self, pair, labels):
        self.accumErr += self.devErr

    def calcVal(self, pair, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        diff = Blas.addVectorToVector(pair[0].ravel(), pair[1].ravel(), alpha=1.0, beta=-1.0).reshape(pair[0].shape)
        absKer(diff, diff)

        dist = Blas.sumOnMatrix(diff, cols=False, alpha=1.0 / pair[0].shape[1])

        l1HingeAccuracy = getAccuracyKernel("l1HingeAccuracy")
        return l1HingeAccuracy(dist, labels, allocator=memPool).get() / pair[0].shape[0]

    def checkDataShape(self, pair, labels):
        assert len(pair) == 2 and pair[0].shape == pair[1].shape and pair[0].dtype == pair[1].dtype
        assert pair[0].dtype == np.float32
        assert pair[0].ndim == 2
        assert labels.dtype == np.int32

    def checkValDataShape(self, pair, labels):
        self.checkDataShape(pair, labels)

    def getBatchsize(self, pair):
        return pair[0].shape[0]

    @staticmethod
    def verifyLabels(labels):
        mn, mx = gpuarray.minimum(labels).get(), gpuarray.maximum(labels).get()

        if mn < 0:
            raise CostError("L1 Hinge labels verification failed, found index %s (< 0)" % mn)

        if mx > 1:
            raise CostError("L1 Hinge labels verification failed, found index %s (> 1)" % mx)
