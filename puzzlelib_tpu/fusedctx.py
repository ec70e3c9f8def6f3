"""Tracing context for the fused train step.

When ``puzzlelib_tpu.fused.FusedStep`` traces the eager object layer into a
single XLA computation, a few values that the eager path treats as Python
scalars must become traced inputs so the compiled step never retraces:

  * the step counter (Adam bias correction, BatchNorm running-stat factor),
  * optimizer hyper-parameters (learning-rate decay between epochs),
  * the RNG key (dropout/noise masks must differ per step).

Modules consult these helpers; outside a fused trace they are pass-throughs.
"""

import jax

_ctx = None


class _Ctx:
    __slots__ = ("hyper", "t", "key", "counter")

    def __init__(self, hyper, t, key):
        self.hyper = hyper
        self.t = t
        self.key = key
        self.counter = 0


class activate:
    def __init__(self, hyper, t, key):
        self.ctx = _Ctx(hyper, t, key)

    def __enter__(self):
        global _ctx
        self.prev, _ctx = _ctx, self.ctx
        return self.ctx

    def __exit__(self, *exc):
        global _ctx
        _ctx = self.prev


def active():
    return _ctx is not None


def stepOr(val):
    return _ctx.t if _ctx is not None else val


def hyperOr(name, val):
    if _ctx is not None and name in _ctx.hyper:
        return _ctx.hyper[name]

    return val


def nextKey():
    assert _ctx is not None

    _ctx.counter += 1
    return jax.random.fold_in(_ctx.key, _ctx.counter)
