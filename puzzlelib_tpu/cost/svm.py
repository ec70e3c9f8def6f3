"""One-vs-rest multiclass SVM cost with L1 or squared (L2) margins.

Parity surface: /root/reference/Cost/SVM.py (mode names, normalization,
``mostProb`` validation protocol). ``ops.cost.svm`` builds the ±1 one-vs-rest
targets and emits error + gradient in one fused XLA program.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.ops import cost as costOps
from puzzlelib_tpu.tensor import GPUArray

from puzzlelib_tpu.cost.cost import Cost, requireLabelRange


class SVM(Cost):
    def __init__(self, mode="l1"):
        super().__init__()

        self.mode = mode
        self.mostProb = None

    def reset(self):
        super().reset()
        self.mostProb = None

    def verifyLabels(self, scores, labels):
        requireLabelRange("SVM", labels, 0, scores.shape[1] - 1)

    def calcGrad(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        err, grad = costOps.svm(scores.jax, labels.jax, mode=self.mode)
        self.devErr._write(err)
        return GPUArray(grad)

    def calcVal(self, scores, labels):
        if Config.verifyData:
            self.verifyLabels(scores, labels)

        wrong = self.calcValDev(scores, labels)
        return float(np.asarray(wrong))

    def calcValDev(self, scores, labels):
        import jax.numpy as jnp

        pred = jnp.argmax(scores.jax, axis=1).astype(jnp.int32)
        self.mostProb = GPUArray(pred)

        wrong = costOps.accuracy(pred, labels.jax)
        return wrong.astype(jnp.float32) / scores.shape[0]

    def checkDataShape(self, scores, labels):
        assert labels.dtype == np.int32
        assert scores.ndim == labels.ndim + 1 and scores.shape[2:] == labels.shape[1:]

    def checkValDataShape(self, scores, labels):
        self.checkDataShape(scores, labels)
