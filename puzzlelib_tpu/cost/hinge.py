"""Elementwise hinge cost over ±1 targets.

Parity surface: /root/reference/Cost/Hinge.py (shapes, normalization, the
±1 label contract). One fused XLA program (``ops.cost.hinge``) yields the
error scalar and the descent gradient together.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost, requireLabelRange


class Hinge(Cost):
    def verifyLabels(self, labels):
        requireLabelRange("Hinge", labels, -1, 1)

    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        err, grad = costOps.hinge(scores.jax, labels.jax)
        self.devErr._write(err)
        return GPUArray(grad)

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        err, _ = costOps.hinge(scores.jax, labels.jax)
        return float(np.asarray(err)) / scores.shape[0]

    def calcValDev(self, scores, labels):
        import jax.numpy as jnp

        err, _ = costOps.hinge(scores.jax, labels.jax)
        return err.astype(jnp.float32) / scores.shape[0]

    def checkDataShape(self, scores, labels):
        self._shapeContract(scores, labels)

    def checkValDataShape(self, scores, labels):
        self._shapeContract(scores, labels)

    @staticmethod
    def _shapeContract(scores, labels):
        assert scores.ndim == 2 and scores.shape == labels.shape
        assert labels.dtype == np.int32
