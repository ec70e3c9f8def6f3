"""Pairwise L1-hinge embedding cost over (x1, x2) pairs with 0/1 labels.

Parity surface: /root/reference/Cost/L1Hinge.py — list-valued prediction,
per-pair gradients, validation thresholds the mean L1 distance at 1. Error
and both gradients come from one fused XLA program (``ops.cost.l1Hinge``).
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost, requireLabelRange


class L1Hinge(Cost):
    def verifyLabels(self, labels):
        requireLabelRange("L1 Hinge", labels, 0, 1)

    def calcGrad(self, pair, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        err, g1, g2 = costOps.l1Hinge(pair[0].jax, pair[1].jax, labels.jax)
        self.devErr._write(err)
        return [GPUArray(g1), GPUArray(g2)]

    def calcVal(self, pair, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        return float(np.asarray(self.calcValDev(pair, labels)))

    def calcValDev(self, pair, labels):
        import jax.numpy as jnp

        # similar iff the mean elementwise distance is within the unit margin;
        # count disagreements with the 0/1 labels
        dist = jnp.mean(jnp.abs(pair[0].jax - pair[1].jax), axis=1)
        wrong = jnp.sum((dist <= 1.0) != labels.jax.astype(bool))

        return wrong.astype(jnp.float32) / pair[0].shape[0]

    def getBatchsize(self, pair):
        return pair[0].shape[0]

    def checkDataShape(self, pair, labels):
        self._shapeContract(pair, labels)

    def checkValDataShape(self, pair, labels):
        self._shapeContract(pair, labels)

    @staticmethod
    def _shapeContract(pair, labels):
        x1, x2 = pair
        assert x1.ndim == 2 and x1.shape == x2.shape
        assert x1.dtype == np.float32 and x2.dtype == np.float32
        assert labels.dtype == np.int32
