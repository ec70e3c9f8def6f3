"""Analytic train-step FLOP accounting and MFU for the benchmark nets.

Walks a model-zoo net module-by-module, counts MXU FLOPs (2·MACs for every
conv/deconv/linear; everything else is bandwidth, not FLOPs), applies the
training multiplier (fwd + bwd-data + bwd-filter = 3x per conv/linear, minus
bwd-data for the first conv, which has no upstream gradient), and prints
sustained TF/s + MFU for a given measured ms/step.

Convention note (this fixes a round-3 bookkeeping error): MFU here is
    (training FLOPs per step) / (measured step seconds) / (bf16 peak FLOP/s)
with FLOPs = 2·MACs, peak = 197 TF/s (v5e).  Counting MACs against a FLOP
peak — as the round-3 "12 % MFU" VGG-16 figure did — undercounts by exactly
2x.  Matches the reference's per-net cost visibility role
(/root/reference/TestLib/OptimizeNet.py:29-37).

Run:  python tools/mfu.py --net vgg16 --batch 32 --ms 29.6
      python tools/mfu.py --net resnet50 --batch 32 --ms 11.2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16 = 197e12   # v5e MXU peak, bf16 FLOP/s


def buildNet(name):
    if name == "vgg16":
        from puzzlelib_tpu.models.nets.vgg import loadVGG
        return loadVGG(None, "16"), (3, 224, 224)
    if name == "resnet50":
        from puzzlelib_tpu.models.nets.resnet import loadResNet
        return loadResNet(None, "50"), (3, 224, 224)
    if name == "nin":
        from puzzlelib_tpu.models.nets.nin import loadNiNImageNet
        return loadNiNImageNet(None), (3, 224, 224)
    raise ValueError(name)


def trainFlops(net, inshape, batch):
    """(train FLOPs/step, fwd FLOPs/img, table rows).

    Shapes are discovered with one real batch-1 forward (handles Graph /
    Parallel topologies the same way a static walk cannot), then scaled by
    ``batch`` — MXU FLOPs are linear in the batch for every counted module.
    """
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.modules import Conv2D, Deconv2D, Linear

    net(gpuarray.to_gpu(np.zeros((1, ) + tuple(inshape), np.float32)))

    rows = []
    state = {"firstConv": True, "fwd": 0.0, "train": 0.0}

    def walk(mod):
        if hasattr(mod, "modules"):
            for m in mod.modules.values():
                walk(m)
            return

        inData, out = mod.inData, mod.data
        if not isinstance(mod, (Conv2D, Deconv2D, Linear)) \
                or inData is None or out is None:
            return
        inShape = (batch, ) + tuple(inData.shape[1:])
        outShape = (batch, ) + tuple(out.shape[1:])

        flops, mult = 0.0, 0.0
        if isinstance(mod, (Conv2D, Deconv2D)):
            co, ci, kh, kw = mod.W.shape
            n, _, oh, ow = outShape if isinstance(mod, Conv2D) else inShape
            flops = 2.0 * n * oh * ow * co * ci * kh * kw
            mult = 2.0 if state["firstConv"] else 3.0   # first conv: no bwd-data
            state["firstConv"] = False
        elif isinstance(mod, Linear):
            insize, outsize = mod.W.shape
            flops = 2.0 * batch * insize * outsize
            mult = 3.0

        if flops:
            rows.append((mod.name, inShape, flops, mult))
            state["fwd"] += flops
            state["train"] += flops * mult

    walk(net)
    net.reset()
    return state["train"], state["fwd"], rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="vgg16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ms", type=float, default=None,
                    help="measured ms/step; prints MFU when given")
    ap.add_argument("--table", action="store_true")
    args = ap.parse_args()

    net, inshape = buildNet(args.net)
    train, fwd, rows = trainFlops(net, inshape, args.batch)

    if args.table:
        for name, shape, flops, mult in rows:
            print("  %-28s in%-20s %8.2f GF x%.0f" %
                  (name, shape, flops / 1e9, mult))

    print("%s batch %d: fwd %.1f GF/img, train %.3f TF/step"
          % (args.net, args.batch, fwd / 1e9 / args.batch, train / 1e12))

    if args.ms is not None:
        tfs = train / (args.ms * 1e-3)
        print("at %.2f ms/step: %.1f TF/s sustained = %.1f%% MFU "
              "(bf16 peak %.0f TF/s)" % (args.ms, tfs / 1e12,
                                         100 * tfs / PEAK_BF16, PEAK_BF16 / 1e12))


if __name__ == "__main__":
    main()
