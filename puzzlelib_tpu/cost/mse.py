"""Mean squared error cost (reference: /root/reference/Cost/MSE.py)."""

import numpy as np

from puzzlelib_tpu.backend import blas as Blas
from puzzlelib_tpu.cost.cost import Cost


class MSE(Cost):
    def calcGrad(self, pred, target):
        c = 1.0 / np.prod(target.shape)
        grad = Blas.addVectorToVector(target.ravel(), pred.ravel(), alpha=c, beta=-c)

        return grad.reshape(pred.shape)

    def calcError(self, pred, target):
        dot = Blas.dot(self.grad.ravel(), self.grad.ravel())
        self.devErr._write(dot.jax * (np.prod(self.grad.shape) * self.grad.shape[0] / 2.0))
        self.accumErr += self.devErr

    def calcVal(self, pred, target):
        diff = Blas.addVectorToVector(target.ravel(), pred.ravel(), alpha=1.0, beta=-1.0)
        return Blas.dot(diff, diff).get() / (2.0 * np.prod(target.shape))

    def calcValDev(self, pred, target):
        import jax.numpy as jnp

        diff = (target.jax - pred.jax).astype(jnp.float32).ravel()
        return jnp.dot(diff, diff) / (2.0 * float(np.prod(target.shape)))

    def checkDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]

    def checkValDataShape(self, pred, target):
        assert pred.shape[1:] == target.shape[1:]
