"""Mean absolute error (L1) regression cost.

Parity surface: /root/reference/Cost/Abs.py — error normalized per-sample,
gradient by the full element count, validation by the full count. The whole
thing is one fused XLA program (``ops.cost.abscost``) instead of the
reference's separate subtract/L1-norm/grad kernels.
"""

import numpy as np

from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost


class Abs(Cost):
    def calcGrad(self, pred, target):
        err, grad = costOps.abscost(pred.jax, target.jax)
        self.devErr._write(err)
        return GPUArray(grad)

    def calcVal(self, pred, target):
        err, _ = costOps.abscost(pred.jax, target.jax)
        return float(np.asarray(err)) / pred.shape[0]

    def calcValDev(self, pred, target):
        import jax.numpy as jnp

        err, _ = costOps.abscost(pred.jax, target.jax)
        return err.astype(jnp.float32) / pred.shape[0]

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

    def checkValDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]
