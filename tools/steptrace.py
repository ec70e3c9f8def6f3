"""Whole-step XLA op-level trace: where a fused train step's milliseconds go.

Runs one fused K-step dispatch under ``jax.profiler.trace`` (which works
through the axon relay: device-side HLO op events come back with durations,
layouts, and bytes) and prints

  * totals by hlo_category (convolution / data formatting / loop fusion /
    select-and-scatter / ...), and
  * the top ops by device time with their long names (layout mismatches are
    visible directly in the {permutation:Tiling} strings).

This is the attribution tool the eager per-layer profiler can't be: it sees
the step AFTER XLA fusion/cancellation, so e.g. the SharedArray flat-buffer
weight relayouts (~37 ms/step on VGG-16) showed up here as per-step
reshape/copy "data formatting" ops on bf16[512,512,3,3] while every eager
marginal pointed elsewhere.

Run: python tools/steptrace.py --net vgg16 --batch 32 [--global-state]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def deviceEvents(traceDir):
    d = sorted(glob.glob(os.path.join(traceDir, "plugins/profile/*")))[-1]
    path = glob.glob(os.path.join(d, "*.trace.json.gz"))[0]

    with gzip.open(path) as fh:
        trace = json.load(fh)

    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        if "hlo_category" not in args:
            continue
        yield e["name"], args


_SHAPE = re.compile(r"\w+\[([\d,]+)\]")


def classify(cat, longName, batch):
    """(stage, kind) bucket for one HLO op.

    stage: the op's characteristic spatial size — the largest adjacent
    equal dim pair over the ACTIVATION shapes in the long name (4-d
    tensors leading with the batch dim; [32,64,224,224] and
    [32,224,224,64] both give 224).  Ops touching no activation (pure
    weight/fc work) bucket as "weights/fc".
    kind: convolution-category ops with no activation-shaped OUTPUT are
    the fused bwd-filter(+optimizer-update) tuples; other conv ops are
    fwd/bwd-data; everything else keeps its hlo_category as the role.
    """
    def actSpatial(part):
        best = 0
        for m in _SHAPE.finditer(part):
            dims = [int(d) for d in m.group(1).split(",")]
            if len(dims) == 4 and dims[0] == batch:
                best = max([best] + [a for a, b in zip(dims[1:], dims[2:])
                                     if a == b])
        return best

    stage = actSpatial(longName)

    kind = cat
    if "convolution" in cat:
        outPart = longName.split(" fusion(")[0].split(" convolution(")[0]
        kind = "conv fwd/bwd-data" if actSpatial(outPart) else "bwd-filter+update"

    return (("%dx%d" % (stage, stage)) if stage else "weights/fc"), kind


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="vgg16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--global-state", action="store_true",
                    help="use the fused SharedArray optimizer state instead of per-var")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep
    from puzzlelib_tpu.benchmarks.netspeed import buildNet

    dtype = {"float32": np.float32, "float16": np.float16,
             "bfloat16": np.dtype(ml_dtypes.bfloat16).type}[args.dtype]

    net, inshape, nlabels = buildNet(args.net)
    if args.dtype != "float32":
        net.calcMode(dtype)

    data = np.random.randn(args.batch, *inshape).astype(dtype)
    labels = np.random.randint(0, nlabels, size=(args.batch, )).astype(np.int32)

    opt = MomentumSGD(learnRate=0.01, momRate=0.9)
    opt.setupOn(net, useGlobalState=args.global_state)
    step = FusedStep(net, CrossEntropy(maxlabels=nlabels), opt)

    devD, devL = gpuarray.to_gpu(data), gpuarray.to_gpu(labels)
    k = args.steps
    dev2 = jnp.tile(devD.jax[None], (k, ) + (1, ) * data.ndim)
    devL2 = jnp.tile(devL.jax[None], (k, 1))
    syncBuf = min(step.buffers, key=lambda b: b.nbytes)

    step.many(dev2, devL2, k)                    # compile
    np.asarray(syncBuf.jax)

    traceDir = tempfile.mkdtemp(prefix="steptrace_")
    with jax.profiler.trace(traceDir):
        step.many(dev2, devL2, k)
        np.asarray(syncBuf.jax)

    byCat = collections.defaultdict(float)
    byOp = collections.defaultdict(float)
    byBucket = collections.defaultdict(float)
    longNames, counts = {}, collections.Counter()
    total = 0.0

    for name, a in deviceEvents(traceDir):
        cat = a["hlo_category"]
        dur = float(a.get("device_duration_ps", 0)) / 1e6       # ps -> us

        if cat in ("host", ):
            continue

        byCat[cat] += dur
        byOp[name] += dur
        counts[name] += 1
        longNames.setdefault(name, a.get("long_name", "")[:140])
        total += dur

        # control-flow wrappers (while/call) cover their body ops' time;
        # counting them would double-attribute every bucket
        if cat not in ("while", "conditional", "call"):
            byBucket[classify(cat, a.get("long_name", ""), args.batch)] += dur

    print("net %s batch %d %s, %d steps traced; device total %.1f ms "
          "(%.2f ms/step)" % (args.net, args.batch, args.dtype, k,
                              total / 1e3, total / 1e3 / k))
    print()
    print("== by hlo_category (per step) ==")
    for cat, dur in sorted(byCat.items(), key=lambda kv: -kv[1]):
        print("  %9.2f ms  %4.1f%%  %s" % (dur / 1e3 / k, dur / total * 100, cat))

    bodyTotal = sum(byBucket.values())
    print()
    print("== by (stage, role) — 100%% of non-control-flow device time ==")
    for (stage, kind), dur in sorted(byBucket.items(), key=lambda kv: -kv[1]):
        print("  %9.2f ms  %4.1f%%  %-10s %s"
              % (dur / 1e3 / k, dur / bodyTotal * 100, stage, kind))

    print()
    print("== top %d ops (per step) ==" % args.top)
    for name, dur in sorted(byOp.items(), key=lambda kv: -kv[1])[:args.top]:
        print("  %9.2f ms %3dx  %s" % (dur / 1e3 / k, counts[name], longNames[name]))


if __name__ == "__main__":
    main()
