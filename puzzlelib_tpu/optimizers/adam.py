"""Reference: /root/reference/Optimizers/Adam.py."""

import math

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import adamKer
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class Adam(Optimizer):
    def __init__(self, alpha=1e-3, beta1=0.9, beta2=0.999, epsilon=1e-8, nodeinfo=None):
        super().__init__(nodeinfo)

        self.alpha = None
        self.beta1 = None
        self.beta2 = None
        self.epsilon = None

        self.setAttr("alpha", alpha)
        self.setAttr("beta1", beta1)
        self.setAttr("beta2", beta2)
        self.setAttr("epsilon", epsilon)

    def setupState(self, var):
        return {
            "mg": gpuarray.zeros(var.data.shape, dtype=np.float32),
            "ms": gpuarray.zeros(var.data.shape, dtype=np.float32)
        }

    def updateVar(self, var, state, stream=None):
        from puzzlelib_tpu import fusedctx

        t = fusedctx.stepOr(self.t)

        if fusedctx.active():
            import jax.numpy as jnp
            fix1, fix2 = 1.0 - self.beta1 ** t, 1.0 - self.beta2 ** t
            self.learnRate = self.alpha * jnp.sqrt(fix2) / fix1
        else:
            fix1, fix2 = 1.0 - self.beta1 ** t, 1.0 - self.beta2 ** t
            self.learnRate = self.alpha * math.sqrt(fix2) / fix1

        fix1, fix2 = 1.0 - self.beta1, 1.0 - self.beta2

        adamKer(var.data.dtype)(
            var.data, var.grad, state["mg"], state["ms"], self.learnRate * var.learnRate, fix1, fix2, self.epsilon,
            stream=stream
        )
