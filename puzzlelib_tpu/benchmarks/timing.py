"""Honest kernel timing through the axon relay.

Two systematic errors poison naive ``time(chain(reps)) / reps`` numbers on
the relayed TPU (measured 2026-08-17, see docs/kernels.md "Measurement
methodology"):

1. Every fenced dispatch pays a VARIABLE fixed cost of ~10-19 ms (relay
   roundtrip + polling quantization) regardless of the work inside - a
   12-rep chain inflates per-op numbers by 0.8-1.6 ms.
2. Ops LINEAR in a perturbed operand (conv, matmul) with SCALAR
   perturbations get algebraically hoisted: XLA rewrites
   conv(x, w + c) = conv(x, w) + c*boxsum(x), computes the real conv once,
   and the chain measures nothing.  Slice-consumers (``out.ravel()[:8]``)
   likewise let XLA slice elementwise producers before computing them.

``marginalTime`` cancels both: reps ride in a ``lax.scan`` (O(1) program
size - the remote compiler rejects long unrolled chains), the consumer is
a full ``jnp.max`` reduction, the caller perturbs with ARRAY deltas, and
the per-op time is the rep-difference of min-of-k fenced calls:

    t_op = (minTime(chain(reps2)) - minTime(chain(reps1))) / (reps2 - reps1)

The reference's timers (Cuda/GPUBackend.py:332-368) fence with events on a
directly-attached device and have neither problem; this module is the
TPU-relay equivalent.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    """Force completion: a tiny device->host readback.
    (``block_until_ready`` is a no-op through the relay.)"""
    return np.asarray(x.ravel()[:1])


def deltaBank(shape, dtype, count=48, scale=0.01, seed=7):
    """Array perturbations for defeating linear-op CSE: ``count`` small
    random tensors of ``shape``."""
    d = jax.random.normal(jax.random.key(seed), (count, ) + tuple(shape),
                          jnp.float32) * scale
    return d.astype(dtype)


def scanChain(fn, reps):
    """jit(sum of max(fn(i, *args)) for i in range(reps)) via lax.scan."""
    @jax.jit
    def chained(*args):
        def body(acc, i):
            return acc + jnp.max(fn(i, *args).astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps))
        return acc

    return chained


def minTime(f, args, k=5):
    """Min over k fenced single calls (the relay's fixed cost varies run to
    run; the min approaches its floor)."""
    best = float("inf")
    for _ in range(k):
        t = time.perf_counter()
        fence(f(*args))
        best = min(best, time.perf_counter() - t)
    return best


def marginalTime(fn, args, reps1=8, reps2=40, k=5, restore=None):
    """Honest per-op seconds for ``fn(i, *args) -> array``.

    The caller must make ``fn`` non-CSEable across ``i`` (index an array
    delta bank with ``i``; scalar perturbations of linear ops don't count).
    ``restore`` (optional) is called after each chain's trace/compile -
    for fns with stateful side effects (module buffers) that would leak
    tracers into the next trace.
    """
    f1, f2 = scanChain(fn, reps1), scanChain(fn, reps2)

    fence(f1(*args))
    if restore is not None:
        restore()

    fence(f2(*args))
    if restore is not None:
        restore()

    # interleave the two chains' samples: the chip's throughput drifts on
    # a seconds scale, and timing all of chain(reps1) before any of
    # chain(reps2) lets a slow window land entirely on one side and
    # corrupt the difference (measured: a 224x224 conv fwd read 10.8 ms
    # vs its true ~1.5 ms when the windows split unluckily)
    t1 = t2 = float("inf")
    for _ in range(k):
        t1 = min(t1, minTime(f1, args, 1))
        t2 = min(t2, minTime(f2, args, 1))

    return (t2 - t1) / (reps2 - reps1)
