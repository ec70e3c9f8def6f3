#!/usr/bin/env python3
"""Earn-or-trim sweep for the Pallas conv kernel inventory.

Races every conv kernel on the shapes where each one's structure says it
could win.  The 2026-08-19 full sweep (tools/convsweep_results.txt) raced
XLA NHWC direct, fused Winograd F(2x2,3x3), batch-in-lanes HCWN, and the
(H,C)-sublane conv3 kernel over 14 signatures: XLA won or tied every one,
including HCWN's design point (the reference ConvSpeed shape family,
/root/reference/Cuda/Benchmarks/ConvSpeed.py: XLA 0.987 ms vs 1.158) and
conv3's (train-batch body shapes, 2-10x behind).  HCWN and conv3 were
deleted on that evidence (earn-or-trim); the surviving candidates are

  - XLA NHWC direct (the default), and
  - Winograd: small-batch stride-1 3x3 (2.25x FLOP cut matters most when
    the MXU isn't saturated).

Methodology = benchmarks/timing.py marginalTime: lax.scan chains (O(1)
program size, no cross-rep CSE), array-delta perturbations via traced
operands, and TRUE rep-differencing — (minTime(chain(40)) -
minTime(chain(8))) / 32 — so the relay's 10-19 ms fixed dispatch cost
cancels exactly (a naive time/reps floor of ~2 ms/call otherwise swamps
every sub-millisecond shape and compresses all ratios toward a tie).
Ties go to XLA (< 0.97x to win).

Run:  python tools/convsweep.py            # full sweep
      python tools/convsweep.py --quick    # fewer shapes
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from puzzlelib_tpu.backend.device import ensureInit
from puzzlelib_tpu.benchmarks.timing import marginalTime, deltaBank

REPS = 40            # reps2 of the marginal; the delta bank must cover it
LONGREPS = 200       # remeasure chain for sub-resolution (tiny-shape) marginals
FLOOR = 50e-6        # below this the 40-rep marginal is noise (can go negative)


def race(datashape, Wshape, pad):
    """Race all applicable kernels at one signature; returns {name: s/call}."""
    from puzzlelib_tpu.ops.pallas import winograd as pwino

    dtype = jnp.bfloat16
    stride, dilation, groups = (1, 1), (1, 1), 1
    n, c, h, w = datashape

    key = jax.random.key(0)
    xN = (jax.random.normal(key, (n, h, w, c), jnp.float32) * 0.3).astype(dtype)
    wz = jnp.zeros(Wshape, dtype)
    dl = deltaBank(Wshape, dtype, count=REPS)

    def xlaF(i, x, wt, d):
        out = lax.conv_general_dilated(
            x, (wt + d[i]).transpose(2, 3, 1, 0), stride,
            [(p, p) for p in pad],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    entries = [("xla", xlaF, (xN, wz, dl))]

    if pwino.applicable(datashape, Wshape, stride, pad, dilation, groups, dtype) \
            and pwino.probeCompile(datashape, Wshape, tuple(pad), dtype):
        entries.append(("winograd",
                        lambda i, x, wt, d: pwino.conv2dNHWC(x, wt + d[i], pad),
                        (xN, wz, dl)))

    times = {}
    for name, fn, args in entries:
        try:
            t = marginalTime(fn, args, reps1=8, reps2=REPS, k=4)
            if t is not None and t < FLOOR:
                # sub-resolution: the relay's run-to-run jitter exceeds the
                # marginal itself (negative values happen); remeasure with a
                # longer chain so the signal dominates
                x, wt, dBank = args
                dLong = deltaBank(Wshape, dtype, count=LONGREPS)
                t = marginalTime(fn, (x, wt, dLong), reps1=8, reps2=LONGREPS, k=4)
            times[name] = t
        except Exception as exc:
            times[name] = None
            print("    %-8s FAILED: %s" % (name, str(exc)[:90]))

    return times


SHAPES = [
    # --- Winograd candidates: small batch, stride-1 3x3 ---
    ((1, 128, 56, 56), (128, 128, 3, 3), (1, 1)),
    ((1, 256, 28, 28), (256, 256, 3, 3), (1, 1)),
    ((1, 512, 14, 14), (512, 512, 3, 3), (1, 1)),
    ((8, 128, 56, 56), (128, 128, 3, 3), (1, 1)),
    ((8, 256, 28, 28), (256, 256, 3, 3), (1, 1)),
    ((8, 512, 14, 14), (512, 512, 3, 3), (1, 1)),
    # the round-3 near-win (winograd measured 2% ahead, tie went to XLA)
    ((32, 128, 56, 56), (128, 128, 3, 3), (1, 1)),
    # --- VGG-16 early stages: the whole-net wall (CO <= 128 in the lane
    # dim at 224^2/112^2; these two stages carry ~1/3 of the 29.6 ms step)
    ((32, 64, 224, 224), (64, 64, 3, 3), (1, 1)),
    ((32, 128, 112, 112), (128, 128, 3, 3), (1, 1)),
    # --- big-kernel, CO < 128 family (was the HCWN design point) ---
    ((128, 32, 64, 64), (64, 32, 11, 11), (0, 0)),     # reference ConvSpeed
    ((128, 64, 56, 56), (64, 64, 7, 7), (3, 3)),
    ((128, 16, 96, 96), (32, 16, 11, 11), (0, 0)),
    # --- train-batch body shapes ---
    ((16, 128, 112, 112), (128, 128, 3, 3), (1, 1)),
    ((32, 256, 28, 28), (256, 256, 3, 3), (1, 1)),
    ((32, 512, 14, 14), (512, 512, 3, 3), (1, 1)),
    # small-batch inference at body shapes (serving: Engine batch 1-8)
    ((4, 256, 56, 56), (256, 256, 3, 3), (1, 1)),
]

QUICK = SHAPES[:2] + SHAPES[6:10] + SHAPES[12:14]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    ensureInit()
    assert jax.default_backend() != "cpu", "sweep needs the TPU"

    wins = {}
    for datashape, Wshape, pad in (QUICK if args.quick else SHAPES):
        print("x%s W%s pad%s" % (datashape, Wshape, pad), flush=True)
        times = race(datashape, Wshape, pad)

        tx = times.get("xla")
        for name, t in sorted(times.items(), key=lambda kv: kv[1] or 1e9):
            if t is None:
                continue
            mark = ""
            if tx and tx > 0 and t > 0 and name != "xla" and t < tx * 0.97:
                mark = "  << WINS (%.2fx)" % (tx / t)
                wins.setdefault(name, []).append((datashape, Wshape, tx / t))
            print("    %-8s %8.3f ms%s" % (name, t * 1e3, mark), flush=True)

    print("\n=== summary ===")
    if not wins:
        print("no kernel beat XLA by >3% anywhere in the sweep")
    for name, entries in wins.items():
        for datashape, Wshape, ratio in entries:
            print("%-8s wins at x%s W%s: %.2fx" % (name, datashape, Wshape, ratio))


if __name__ == "__main__":
    main()
