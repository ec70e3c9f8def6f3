"""NIN at the exact CIFAR-10 topology, trained on real data obtainable
offline.

BASELINE.md names the CnnCifar10NIN accuracy run
(/root/reference/TestLib/CnnCifar10NIN.py:74-90); CIFAR-10 itself is not
fetchable in this zero-egress environment, so the documented substitute is
the UCI handwritten-digits dataset (sklearn's bundled copy — 1797 real 8x8
images) bilinearly upsampled to 3x32x32.  The NETWORK is byte-identical to
the CIFAR config (same ``buildNet`` import: three NIN blocks, gaussian
wscale 0.05, dropout), as is the recipe (per-feature standardization,
MomentumSGD 0.1/0.9 + 1e-4 weight decay, LR annealing) — only the pixels
differ, so the artifact proves the full NIN training config converges
end-to-end on chip.

The 1500-sample train set means an epoch is 11 steps, so the epoch count is
scaled up (300 epochs = 3.3k steps ~ CIFAR's first 8 epochs) and the LR
anneal points move accordingly.  The 33x-smaller dataset also needs random
+-2px shift augmentation (host-side, per epoch): without it the run
plateaus at 88.2% (train CE stuck at 0.46 — measured on chip 2026-08-20);
with it the same network/recipe reached 98.3% held-out in 300 epochs
(on-chip A/B at stepsPerDispatch=1).  The network itself stays
byte-identical to the CIFAR config.

Stability: at 11 steps/epoch the CIFAR constants (LR 0.1, momentum 0.9) sit
on the edge of divergence — with augmentation resampling the data each
epoch, some RNG trajectories collapse to a dead-ReLU net (train CE pinned
at log(10); reproduced deterministically on chip 2026-08-20, while the
stepsPerDispatch=1 trajectory of the same recipe converged).  Two standard
stabilizers make the run trajectory-robust without touching the network or
the peak recipe: a linear LR warmup over the first 30 epochs, and
per-variable gradient-norm clipping (``GradClip(1.0)``, this framework's
hook extension).

Run:  python testlib/digitsnin.py [epochs]
Gate: held-out accuracy >= 0.95 (10-class, 297 val samples).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from testlib.cnncifar10nin import buildNet, standardize


def augmentShift(data, rng, maxshift=2):
    """Random +-maxshift px translations with edge padding (host-side numpy,
    per epoch).  Compensates for the 33x-smaller-than-CIFAR train set; the
    reference framework's own augmentation seam is the host-side Transformers
    pipeline (/root/reference/Transformers/Provider.py), so host numpy is the
    faithful place for it."""
    n = data.shape[0]
    out = np.empty_like(data)
    pad = np.pad(data, ((0, 0), (0, 0), (maxshift, maxshift), (maxshift, maxshift)),
                 mode="edge")
    dys = rng.randint(0, 2 * maxshift + 1, size=n)
    dxs = rng.randint(0, 2 * maxshift + 1, size=n)
    for i in range(n):
        out[i] = pad[i, :, dys[i]:dys[i] + 32, dxs[i]:dxs[i] + 32]
    return out


def loadDigits32():
    from sklearn.datasets import load_digits

    digits = load_digits()
    images = digits.images.astype(np.float32) / 16.0           # (1797, 8, 8)
    labels = digits.target.astype(np.int32)

    rng = np.random.RandomState(0)
    order = rng.permutation(len(images))
    images, labels = images[order], labels[order]

    # bilinear 8x8 -> 32x32, replicated to 3 channels (host-side numpy so the
    # dataset prep stays off the device, like the reference's loaders)
    up = np.repeat(np.repeat(images, 4, axis=1), 4, axis=2)     # nearest 4x
    kernel = np.ones((4, 4), np.float32) / 16.0
    for _ in range(1):                                          # one smoothing pass
        padded = np.pad(up, ((0, 0), (2, 2), (2, 2)), mode="edge")
        sm = np.zeros_like(up)
        for dy in range(4):
            for dx in range(4):
                sm += kernel[dy, dx] * padded[:, dy:dy + 32, dx:dx + 32]
        up = sm

    data = np.repeat(up[:, None], 3, axis=1)                    # (n, 3, 32, 32)
    return np.ascontiguousarray(data), labels


def main(epochs=300):
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()                 # remote TPU compiles take minutes cold

    from puzzlelib_tpu.optimizers import hooks as Hooks
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedTrainer, FusedValidator
    from puzzlelib_tpu.cost import CrossEntropy

    data, labels = loadDigits32()
    data = standardize(data)
    split = 1500
    print("Loaded digits->32x32x3: train %d, val %d" % (split, len(data) - split))

    np.random.seed(1234)
    net = buildNet()

    optimizer = MomentumSGD(learnRate=0.1, momRate=0.9)
    optimizer.addHook(Hooks.GradClip(1.0))        # clip raw grads, then decay
    optimizer.addHook(Hooks.WeightDecay(0.0001))
    optimizer.setupOn(net, useGlobalState=False)

    cost = CrossEntropy(maxlabels=10)
    # 1500 train samples = 11 full batches: group them into ONE dispatch per
    # epoch (lax.scan over steps); validation is one fused program per batch.
    # NIN_STEPS_PER_DISPATCH=1 skips the scan program (CPU-oracle smoke runs:
    # the 11-step scan compile is minutes on CPU, fine on TPU)
    K = int(os.environ.get("NIN_STEPS_PER_DISPATCH", "11"))
    trainer = FusedTrainer(net, cost, optimizer, batchsize=128, stepsPerDispatch=K)
    validator = FusedValidator(net, cost, batchsize=128)

    warmupEpochs = 30
    augrng = np.random.RandomState(7)
    for epoch in range(1, epochs + 1):
        start = time.time()
        # linear warmup to the CIFAR peak LR, x0.1 anneals at 200/250 as in
        # the CIFAR recipe; learnRate is a traced hyper of the fused step, so
        # the schedule costs no recompile
        lr = 0.1 * min(1.0, epoch / float(warmupEpochs))
        optimizer.learnRate = lr * (0.1 if epoch > 200 else 1.0) * (0.1 if epoch > 250 else 1.0)
        trainer.trainFromHost(augmentShift(data[:split], augrng), labels[:split],
                              macroBatchSize=split)

        valerror = validator.validateFromHost(data[split:], labels[split:],
                                              macroBatchSize=len(data) - split)
        print("Finished epoch %d out of %d. Train error: %.5f, val error: %.5f (%.1fs)"
              % (epoch, epochs, trainer.cost.getMeanError(), valerror, time.time() - start),
              flush=True)

        if epoch in (200, 250):
            print("Annealing learn rate from next epoch", flush=True)

    accuracy = 1.0 - valerror
    print("Final held-out accuracy: %.4f" % accuracy)
    assert accuracy >= 0.95, "NIN did not converge: %.4f" % accuracy


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
