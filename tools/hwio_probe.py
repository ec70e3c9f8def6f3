#!/usr/bin/env python3
"""Physical-HWIO weight state vs logical (co,ci,kh,kw) state for a fused
conv train step.

The VGG-16 wall analysis (docs/kernels.md) attributes ~8 ms/step to
per-conv weight-update fusions: the bwd-filter conv's natural output
layout disagrees with the logical weight's {0,1,3,2} tiling, and XLA
fuses the relayout into the momentum update (~0.6 ms per 512-map conv).
The AUTO-boundary-layout experiment refuted the boundary hypothesis, so
this probes the remaining lever: store W physically as (kh, kw, ci, co)
in the step state, so fwd consumes it directly, bwd-filter produces it
natively, and the momentum update is relayout-free.

Methodology = benchmarks.timing: K-step training scan (state threading
like FusedStep.many), rep-differenced min-of-k marginals.

Run: python tools/hwio_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import sys; sys.path.insert(0, "/root/repo")
from puzzlelib_tpu.backend.device import ensureInit
from puzzlelib_tpu.benchmarks.timing import fence


# VGG-16 body: 4 convs at each of the heavy shapes
TOWERS = [
    # (spatial, channels, nconvs)
    (28, 512, 4),
    (56, 256, 3),
]
BATCH = 32
DTYPE = jnp.bfloat16


def makeState(hwio, key):
    Ws, moms = [], []
    for sp, ch, n in TOWERS:
        for i in range(n):
            key, sub = jax.random.split(key)
            shape = (3, 3, ch, ch) if hwio else (ch, ch, 3, 3)
            w = (jax.random.normal(sub, shape, jnp.float32) * 0.05).astype(DTYPE)
            Ws.append(w)
            moms.append(jnp.zeros(shape, DTYPE))
    return Ws, moms


def towerLoss(Ws, xs, hwio):
    """Forward through all towers; mean-square loss (keeps bwd alive)."""
    total = jnp.float32(0)
    wi = 0
    for (sp, ch, n), x in zip(TOWERS, xs):
        h = x
        for i in range(n):
            w = Ws[wi] if hwio else Ws[wi].transpose(2, 3, 1, 0)
            h = lax.conv_general_dilated(
                h.astype(DTYPE), w.astype(DTYPE), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu(h)
            wi += 1
        total = total + jnp.mean(h.astype(jnp.float32) ** 2)
    return total


def makeStep(hwio, xs):
    def step(state, t):
        Ws, moms = state
        # perturb via t so no cross-step CSE
        xsP = [(x.astype(jnp.float32) + t * 1e-6).astype(DTYPE) for x in xs]

        loss, g = jax.value_and_grad(lambda Ws: towerLoss(Ws, xsP, hwio))(Ws)
        newMoms = [(0.9 * m.astype(jnp.float32) + 0.01 * dw.astype(jnp.float32)).astype(DTYPE)
                   for m, dw in zip(moms, g)]
        newWs = [(w.astype(jnp.float32) - m.astype(jnp.float32)).astype(DTYPE)
                 for w, m in zip(Ws, newMoms)]
        return (newWs, newMoms), loss

    return step


def chained(hwio, xs, reps):
    step = makeStep(hwio, xs)

    @jax.jit
    def run(state):
        state, losses = lax.scan(step, state, jnp.arange(reps, dtype=jnp.float32))
        return state, jnp.sum(losses)

    return run


def minTime(f, state, k=4):
    _, s = f(state)
    fence(s)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        _, s = f(state)
        fence(s)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ensureInit()
    key = jax.random.key(0)

    xs = []
    for sp, ch, n in TOWERS:
        key, sub = jax.random.split(key)
        xs.append((jax.random.normal(sub, (BATCH, sp, sp, ch), jnp.float32) * 0.3).astype(DTYPE))

    R1, R2 = 4, 12

    for hwio in (False, True):
        state = makeState(hwio, jax.random.key(1))
        f1, f2 = chained(hwio, xs, R1), chained(hwio, xs, R2)
        t1, t2 = minTime(f1, state), minTime(f2, state)
        per = (t2 - t1) / (R2 - R1)
        print("%s: %.3f ms/step (marginal over %d extra steps)" %
              ("physical-HWIO" if hwio else "logical OIHW ", per * 1e3, R2 - R1))


if __name__ == "__main__":
    main()
