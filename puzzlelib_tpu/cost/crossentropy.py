"""Softmax cross-entropy classification cost.

Parity surface: /root/reference/Cost/CrossEntropy.py (ctor arguments, the
``validate``/``mostProb`` protocol, optional per-class weights). The compute is
the single fused XLA program in ``ops.cost.crossEntropy`` — error scalar and
descent-direction gradient come out of one dispatch, and validation fuses the
channel argmax with the mismatch count so the whole thing is one readback.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost, requireLabelRange


class CrossEntropy(Cost):
    def __init__(self, maxlabels=None, weights=None):
        super().__init__()

        self.maxlabels = maxlabels
        self.mostProb = None
        self.weights = gpuarray.to_gpu(weights) if isinstance(weights, np.ndarray) else weights

    def reset(self):
        super().reset()
        self.mostProb = None

    def verifyLabels(self, scores, labels):
        requireLabelRange("Cross entropy", labels, 0, scores.shape[1] - 1)

    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        w = self.weights
        err, grad = costOps.crossEntropy(scores.jax, labels.jax,
                                         None if w is None else w.jax, hasWeights=w is not None)
        self.devErr._write(err)
        return GPUArray(grad)

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        wrong = self.calcValDev(scores, labels)
        return float(np.asarray(wrong))

    def calcValDev(self, scores, labels):
        import jax.numpy as jnp

        # argmax over the class axis lines the prediction tensor up with the
        # label tensor for any number of trailing spatial dims
        pred = jnp.argmax(scores.jax, axis=1).astype(jnp.int32)
        self.mostProb = GPUArray(pred)

        wrong = costOps.accuracy(pred, labels.jax)
        return wrong.astype(jnp.float32) / labels.size

    def checkDataShape(self, scores, labels):
        self._shapeContract(scores, labels)

        if self.weights is not None:
            assert self.weights.shape == (scores.shape[1], )

    def checkValDataShape(self, scores, labels):
        self._shapeContract(scores, labels)

    def _shapeContract(self, scores, labels):
        assert labels.dtype == np.int32
        assert scores.ndim == labels.ndim + 1 and scores.shape[2:] == labels.shape[1:]

        if self.maxlabels:
            assert scores.shape[1] == self.maxlabels
