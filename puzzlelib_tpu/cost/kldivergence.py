"""KL divergence cost between a softmaxed prediction and a target distribution.

Parity surface: /root/reference/Cost/KLDivergence.py — softmax runs over all
non-batch dims flattened, ``normTarget`` softmaxes the target too, the stored
batch error is the unnormalized divergence sum. ``ops.cost.kldiv`` fuses
softmax, divergence and gradient into one XLA program.
"""

import numpy as np

from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost


class KLDivergence(Cost):
    def __init__(self, maxlabels=None, normTarget=False):
        super().__init__()

        self.maxlabels = maxlabels
        self.normTarget = normTarget

    def _divergence(self, pred, target):
        """Fused (mean divergence, grad) with non-batch dims flattened, so the
        softmax spans the whole sample regardless of trailing spatial dims."""
        batch = pred.shape[0]
        flat = (batch, int(np.prod(pred.shape[1:])))

        err, grad = costOps.kldiv(pred.jax.reshape(flat), target.jax.reshape(flat),
                                  normTarget=self.normTarget)
        return err, grad.reshape(pred.shape)

    def calcGrad(self, pred, target):
        err, grad = self._divergence(pred, target)

        # base-class convention stores the raw batch SUM; kldiv returns the
        # mean, so scale back up before getError divides by batch again
        self.devErr._write(err * pred.shape[0])
        return GPUArray(grad)

    def calcVal(self, pred, target):
        err, _ = self._divergence(pred, target)
        return float(np.asarray(err))

    def calcValDev(self, pred, target):
        import jax.numpy as jnp

        err, _ = self._divergence(pred, target)
        return err.astype(jnp.float32)

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

        if self.maxlabels:
            assert pred.shape[1] == self.maxlabels

    def checkValDataShape(self, pred, target):
        self.checkDataShape(pred, target)
