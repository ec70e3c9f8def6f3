"""Binary cross-entropy over raw logits with {0, 1} integer targets.

Parity surface: /root/reference/Cost/BCE.py (logit convention — sigmoid is
fused into the cost, validation thresholds at 0). ``ops.cost.bce`` computes
error + gradient in one XLA program; validation is a fused mispredict count.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost, requireLabelRange


class BCE(Cost):
    def verifyLabels(self, labels):
        requireLabelRange("BCE", labels, 0, 1)

    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        err, grad = costOps.bce(scores.jax, labels.jax)
        self.devErr._write(err)
        return GPUArray(grad)

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(labels)

        return float(np.asarray(self.calcValDev(scores, labels)))

    def calcValDev(self, scores, labels):
        import jax.numpy as jnp

        # logit sign is the decision boundary: count disagreements with labels
        x, y = scores.jax.ravel(), labels.jax.ravel()
        wrong = jnp.sum(jnp.where(y == 1, x <= 0.0, x > 0.0))
        return wrong.astype(jnp.float32) / scores.size

    def checkDataShape(self, scores, labels):
        self._shapeContract(scores, labels)

    def checkValDataShape(self, scores, labels):
        self._shapeContract(scores, labels)

    @staticmethod
    def _shapeContract(scores, labels):
        assert labels.dtype == np.int32

        if scores.ndim == 2 and scores.shape[1] == 1:
            assert labels.ndim == 1
        else:
            assert np.prod(scores.shape[1:]) == np.prod(labels.shape[1:])
