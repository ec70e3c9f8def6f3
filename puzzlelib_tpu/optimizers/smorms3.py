"""Reference: /root/reference/Optimizers/SMORMS3.py."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.elementwise import smorms3Ker
from puzzlelib_tpu.optimizers.optimizer import Optimizer


class SMORMS3(Optimizer):
    def __init__(self, learnRate=1e-3, epsilon=1e-16, nodeinfo=None):
        super().__init__(nodeinfo)

        self.epsilon = None

        self.setAttr("learnRate", learnRate)
        self.setAttr("epsilon", epsilon)

    def setupState(self, var):
        return {
            "mem": gpuarray.to_gpu(np.ones(var.data.shape, dtype=np.float32)),
            "mg": gpuarray.zeros(var.data.shape, dtype=np.float32),
            "ms": gpuarray.zeros(var.data.shape, dtype=np.float32)
        }

    def updateVar(self, var, state, stream=None):
        smorms3Ker(var.data.dtype)(
            var.data, var.grad, state["mem"], state["mg"], state["ms"], self.learnRate * var.learnRate,
            self.epsilon, stream=stream
        )
