"""Serving-engine throughput benchmark (exported-engine path).

The reference's serving story is the TensorRT engine
(/root/reference/Converter/TensorRT/RTEngine.py:27 - build once, then batched
inference at engine rate).  Here the engine is a serialized ``jax.export``
program; through the TPU relay each dispatch pays a fixed ~2.3 ms floor, so
per-batch eager serving is dispatch-bound long before compute saturates.
``Engine.many`` (a lax.scan over the exported executable) amortizes that -
this harness publishes BOTH numbers per dtype:

  * eager: one dispatch per batch (what a naive serving loop gets), and
  * many-marginal: K vs 2K grouped batches differenced (the engine's honest
    compute rate, what a pipelined server gets).

Run:  python -m puzzlelib_tpu.benchmarks.enginespeed --net nin --batch 128
      python -m puzzlelib_tpu.benchmarks.enginespeed --batch 512 --dtypes float32,int8
"""

import argparse
import os
import tempfile
import time

import numpy as np

from puzzlelib_tpu.benchmarks.netspeed import buildNet


def measure(engine, devBatch, syncRead, k, iters):
    """(eager secs/batch, many-marginal secs/batch) for one engine."""
    out = engine(devBatch)                                   # compile eager
    np.asarray(out.jax.ravel()[:1])

    start = time.perf_counter()
    for _ in range(iters):
        out = engine(devBatch)
    np.asarray(out.jax.ravel()[:1])                          # honest fence
    eager = (time.perf_counter() - start) / iters

    # grouped: repeat the resident batch K times inside one program —
    # materializing a (2K, batch, ...) stack OOMs HBM at serving batch sizes
    # (NIN b1024 many=8 = ~10 GB); manyRepeat keeps the batch 1x and defeats
    # loop hoisting with opaque per-step deltas
    def run(steps):
        out = engine.manyRepeat(devBatch, steps)
        np.asarray(out.jax.ravel()[:1])

    run(k)                                                   # compile
    run(2 * k)

    def minTime(steps, tries=3):
        best = float("inf")
        for _ in range(tries):
            t = time.perf_counter()
            run(steps)
            best = min(best, time.perf_counter() - t)
        return best

    marginal = (minTime(2 * k) - minTime(k)) / k
    return eager, marginal


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", default="nin")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--dtypes", default="float32,int8",
                        help="comma list of float32,bfloat16,float16,int8")
    parser.add_argument("--many", type=int, default=8, metavar="K")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.converter.engine import buildEngine, Engine, DataCalibrator

    np.random.seed(5)

    net, inshape, _ = buildNet(args.net)
    data = np.random.randn(args.batch, *inshape).astype(np.float32)
    devBatch = gpuarray.to_gpu(data)

    with tempfile.TemporaryDirectory() as tmp:
        for dtype in args.dtypes.split(","):
            calibrator = None
            if dtype == "int8":
                calibrator = DataCalibrator(data[:min(64, args.batch)],
                                            batchsize=16, algo="minmax")

            buildEngine(net, inshape=(args.batch, ) + inshape, savepath=tmp,
                        dtype=dtype, name=args.net, calibrator=calibrator,
                        returnEngine=False)
            engine = Engine(os.path.join(tmp, "%s.%s.engine" % (args.net, dtype)))

            eager, marginal = measure(engine, devBatch, None, args.many, args.iters)

            print("%s serve %s batch %d: eager %.2f ms/batch = %.0f img/s; "
                  "many-marginal %.2f ms/batch = %.0f img/s" %
                  (args.net, dtype, args.batch,
                   eager * 1e3, args.batch / eager,
                   marginal * 1e3, args.batch / marginal))


if __name__ == "__main__":
    main()
