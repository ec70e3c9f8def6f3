"""Trainable parameter wrapper.

API parity target: /root/reference/Variable.py (``.data``/``.grad`` pair with
per-variable learning-rate / momentum / weight-decay multipliers and optional
custom updaters).  TPU note: ``.grad`` is a GPUArray whose buffer is rebound
functionally by the fused step — allocation here is lazy with respect to eval
mode so inference graphs never materialise gradient storage.
"""

import itertools

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray


_anonymous = itertools.count()


class Variable:
    # kept for reference-API compatibility: mirrors the auto-name counter
    index = 0

    def __init__(self, data, name=None, withgrad=True, grad=None, updater=None, postUpdater=None):
        if name is None:
            name = str(next(_anonymous))
            Variable.index += 1

        self.name, self.data, self.updater = name, data, updater

        # a variable with a custom updater owns no framework-managed state:
        # the updater callable is the whole update policy
        if updater is not None:
            return

        self.postUpdater = postUpdater
        self.grad = self._allocGrad(withgrad) if grad is None else grad

        # per-variable multipliers applied on top of the optimizer's globals
        self.learnRate, self.momRate, self.wc = 1.0, 1.0, 0.0

    def _allocGrad(self, withgrad):
        if not withgrad or Config.globalEvalMode:
            return None

        return gpuarray.zeros(shape=self.data.shape, dtype=self.data.dtype)

    @property
    def hasUpdater(self):
        return callable(self.updater)

    @property
    def hasPostUpdater(self):
        return callable(self.postUpdater)

    def update(self, learnRate):
        return self.updater(self, learnRate)

    def postUpdate(self):
        return self.postUpdater(self)

    def set(self, variable):
        self.data.set(variable.data)

        if self.grad is None:
            return

        self.grad.set(variable.grad)
