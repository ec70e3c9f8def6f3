"""Smooth-L1 (Huber) regression cost.

Parity surface: /root/reference/Cost/SmoothL1.py — error normalized per-sample
(``1/prod(shape[1:])``), gradient by the full element count; validation
returns the fully normalized error. One fused XLA program per call
(``ops.cost.smoothL1``).
"""

import numpy as np

from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost


class SmoothL1(Cost):
    def calcGrad(self, pred, target):
        perSample = 1.0 / np.prod(target.shape[1:])
        perElem = 1.0 / np.prod(target.shape)

        err, grad = costOps.smoothL1(pred.jax, target.jax, perSample, perElem)
        self.devErr._write(err)
        return GPUArray(grad)

    def calcVal(self, pred, target):
        return float(np.asarray(self.calcValDev(pred, target)))

    def calcValDev(self, pred, target):
        import jax.numpy as jnp

        perElem = 1.0 / np.prod(target.shape)

        err, _ = costOps.smoothL1(pred.jax, target.jax, perElem, perElem)
        return err.astype(jnp.float32)

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

    def checkValDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]
