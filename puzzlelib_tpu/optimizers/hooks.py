"""Optimizer hooks.

API parity target: /root/reference/Optimizers/Hooks.py — callables invoked on
each (var, state) pair right before the update kernel; weight decay folds an
L2 penalty into the gradient with one fused elementwise op.  ``GradClip`` is
an extension beyond the reference hook set (the reference ships WeightDecay
only); like every hook it traces cleanly into the fused train step.
"""

import numpy as np

from puzzlelib_tpu.backend.kernels.elementwise import weightDecayKer, gradClipKer


class Hook:
    __slots__ = ()

    def __call__(self, var, state, stream=None):
        raise NotImplementedError()


class WeightDecay(Hook):
    __slots__ = ("rate", )

    def __init__(self, rate):
        self.rate = rate

    def __call__(self, var, state, stream=None):
        if var.grad.dtype != np.float32:
            raise AssertionError("weight decay expects fp32 grads, got %s" % var.grad.dtype)

        decay = self.rate * var.wc
        if decay > 0.0:
            weightDecayKer(var.grad, var.data, decay, stream=stream)


class GradClip(Hook):
    """Rescale each variable's gradient so its L2 norm is at most ``maxnorm``.

    Per-variable (the hook contract is one ``(var, state)`` pair at a time);
    stabilizes high-LR momentum recipes on small/augmented datasets where a
    single hot minibatch can blow up the trajectory."""

    __slots__ = ("maxnorm", )

    def __init__(self, maxnorm):
        self.maxnorm = maxnorm

    def __call__(self, var, state, stream=None):
        gradClipKer(var.grad, self.maxnorm, stream=stream)
