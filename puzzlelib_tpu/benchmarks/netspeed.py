"""Full-network train/infer throughput benchmark.

Reference analogue: /root/reference/TestLib/OptimizeNet.py:29-37 times a
VGG-16 train step before/after cuDNN autotuning. Here the fused
single-executable step is the tuned path; this harness generalises it to any
bundled net and dtype.

Run:  python -m puzzlelib_tpu.benchmarks.netspeed --net vgg16 --batch 32
      python -m puzzlelib_tpu.benchmarks.netspeed --net resnet50 --dtype bfloat16
"""

import argparse
import time

import numpy as np


def buildNet(name):
    if name.startswith("vgg"):
        from puzzlelib_tpu.models.nets.vgg import loadVGG
        return loadVGG(None, name[3:]), (3, 224, 224), 1000

    if name.startswith("resnet"):
        from puzzlelib_tpu.models.nets.resnet import loadResNet
        return loadResNet(None, name[6:]), (3, 224, 224), 1000

    if name == "nin":
        from puzzlelib_tpu.models.nets.nin import loadNiNImageNet
        return loadNiNImageNet(None), (3, 224, 224), 1000

    if name == "lenet":
        from puzzlelib_tpu.models.nets.lenet import loadLeNet
        return loadLeNet(None), (1, 28, 28), 10

    raise ValueError("unknown net %s" % name)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", default="vgg16")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--dtype", default="float32", choices=["float32", "float16", "bfloat16"])
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--many", type=int, default=0, metavar="K",
                        help="honest per-step time via FusedStep.many: run K and "
                             "2K steps in single dispatches and difference them "
                             "(cancels the relay's 10-19 ms per-dispatch cost)")
    parser.add_argument("--infer", action="store_true", help="time inference instead of training")
    parser.add_argument("--profile", action="store_true",
                        help="per-layer fwd/bwd time+roofline table (ConvPerf/OptimizeNet analogue)")
    args = parser.parse_args()

    import jax

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()
    import ml_dtypes

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    dtype = {"float32": np.float32, "float16": np.float16,
             "bfloat16": np.dtype(ml_dtypes.bfloat16).type}[args.dtype]

    net, inshape, nlabels = buildNet(args.net)
    if args.dtype != "float32":
        net.calcMode(dtype)

    data = np.random.randn(args.batch, *inshape).astype(dtype)
    labels = np.random.randint(0, nlabels, size=(args.batch, )).astype(np.int32)

    if args.infer:
        net.evalMode()
        dev = gpuarray.to_gpu(data)

        out = net(dev)                                       # compile
        np.asarray(out.jax)

        start = time.perf_counter()
        for _ in range(args.iters):
            out = net(dev)
        # device->host read: the only honest fence on relayed PJRT backends
        np.asarray(out.jax)
        secs = (time.perf_counter() - start) / args.iters
        mode = "infer"

    else:
        optimizer = MomentumSGD(learnRate=0.01, momRate=0.9)
        # per-var state: the SharedArray flat buffer forces per-step weight
        # relayouts under XLA (68.4 -> 31.5 ms/step on VGG-16, 2026-08-19)
        optimizer.setupOn(net, useGlobalState=False)
        step = FusedStep(net, CrossEntropy(maxlabels=nlabels), optimizer)

        devData, devLabels = gpuarray.to_gpu(data), gpuarray.to_gpu(labels)

        syncBuf = min(step.buffers, key=lambda b: b.nbytes)

        if args.many:
            # marginal per-step time: K and 2K steps in single dispatches,
            # differenced (the relay charges 10-19 ms per dispatch; a naive
            # eager loop reads that instead of the step)
            import jax.numpy as jnp

            k = args.many
            # stack minibatches on device (a ~600 MB host upload through the
            # relay would take minutes)
            dev2 = jnp.tile(devData.jax[None], (2 * k, ) + (1, ) * data.ndim)
            devL2 = jnp.tile(devLabels.jax[None], (2 * k, 1))

            def run(steps):
                step.many(dev2[:steps], devL2[:steps], steps)
                np.asarray(syncBuf.jax)

            run(k)                                           # compile
            run(2 * k)

            def minTime(steps, tries=3):
                best = float("inf")
                for _ in range(tries):
                    t = time.perf_counter()
                    run(steps)
                    best = min(best, time.perf_counter() - t)
                return best

            t1 = minTime(k)
            t2 = minTime(2 * k)
            secs = (t2 - t1) / k
            mode = "train(many-marginal)"

        else:
            step(devData, devLabels)                         # compile
            np.asarray(syncBuf.jax)

            start = time.perf_counter()
            for _ in range(args.iters):
                step(devData, devLabels)
            # tiny device->host read: the only honest fence on relayed PJRT
            np.asarray(syncBuf.jax)
            secs = (time.perf_counter() - start) / args.iters
            mode = "train"

    print("%s %s %s batch %d: %.2f ms/step, %.1f images/sec" %
          (args.net, mode, args.dtype, args.batch, secs * 1e3, args.batch / secs))

    if args.profile:
        from puzzlelib_tpu.benchmarks.layerprofile import profileNet
        profileNet(net, data, stepSecs=None if args.infer else secs)


if __name__ == "__main__":
    main()
