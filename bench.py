"""Headline benchmark: LeNet-class CNN training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no absolute numbers (see BASELINE.md), so
``vs_baseline`` reports the speedup of the fused single-executable train step
over the eager per-op dispatch path (the reference's execution model) measured
on the same hardware in the same process.
"""

import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def buildNet():
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Activation, relu, Flatten, Linear

    # reference LeNet topology (/root/reference/Models/Nets/LeNet.py)
    net = Sequential(name="lenet")
    net.append(Conv2D(1, 16, 3))
    net.append(MaxPool2D())
    net.append(Activation(relu))

    net.append(Conv2D(16, 32, 4))
    net.append(MaxPool2D())
    net.append(Activation(relu))

    net.append(Flatten())
    net.append(Linear(32 * 5 * 5, 1024))
    net.append(Activation(relu))

    net.append(Linear(1024, 10))

    return net


def timeSteps(stepFn, sync, warmup=5, iters=30):
    for _ in range(warmup):
        stepFn()
    sync()

    start = time.perf_counter()
    for _ in range(iters):
        stepFn()
    sync()

    return (time.perf_counter() - start) / iters


def enableCompileCache():
    """Persistent XLA executable cache: the axon remote-compile path can take
    minutes per program cold, so bench warms a local cache under the repo
    (TPU only — CPU AOT entries are machine-feature-pinned)."""
    from puzzlelib_tpu.benchmarks import enableCompileCache as _enable
    _enable()


def probeRelay(timeout=900):
    """Bounded aliveness probe in a subprocess: the axon relay wedges for
    hours at a time, and a wedged relay hangs even backend init - better to
    report a structured failure than to hang the driver."""
    import subprocess

    code = ("import jax.numpy as jnp, numpy as np;"
            "a = jnp.ones((256, 256), jnp.bfloat16);"
            "np.asarray((a @ a).ravel()[:1]); print('OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
        return "OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def measureFusedGroups(buildFn, inshape, batch, ksteps, groups=5, iters=4):
    """Per-step seconds for ``groups`` independently timed runs of the fused
    K-step dispatch — the spread across groups characterizes the relay's
    run-to-run variance (the source of the 289k→228k LeNet drift across
    rounds; see PARITY §6)."""
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedStep

    np.random.seed(0)
    data = np.random.randn(ksteps * batch, *inshape).astype(np.float32)
    labels = np.random.randint(0, 10, size=(ksteps * batch, )).astype(np.int32)

    net = buildFn()
    optimizer = MomentumSGD(learnRate=0.01, momRate=0.9)
    # per-var state: the flat SharedArray costs per-step weight relayouts
    # under XLA (measured 2.2x the VGG-16 step; see docs/benchmarks.md)
    optimizer.setupOn(net, useGlobalState=False)

    step = FusedStep(net, CrossEntropy(), optimizer)
    dataDev, labelsDev = gpuarray.to_gpu(data), gpuarray.to_gpu(labels)

    syncBuf = min(step.buffers, key=lambda b: b.nbytes)
    run = lambda: step.many(dataDev, labelsDev, steps=ksteps)
    sync = lambda: np.asarray(syncBuf.jax)

    # sync via a tiny host readback: on relayed PJRT backends
    # ``block_until_ready`` can return before execution finishes, so the only
    # honest fence is a device->host read of a buffer the step wrote
    return [timeSteps(run, sync, warmup=2 if g == 0 else 0, iters=iters) / ksteps
            for g in range(groups)]


def buildNiN():
    # the reference's CIFAR-10 Network-in-Network (TestLib/CnnCifar10NIN.py)
    from testlib.cnncifar10nin import buildNet as buildNiNNet
    return buildNiNNet()


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] != "cpu" \
            and not probeRelay():
        print(json.dumps({
            "metric": "lenet_train_images_per_sec",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "error": "TPU relay unreachable (probe timed out); no measurement",
        }))
        return

    enableCompileCache()

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    ksteps = int(os.environ.get("BENCH_STEPS", "16"))

    lenetSecs = measureFusedGroups(buildNet, (1, 28, 28), batch, ksteps)
    fusedSec = float(np.median(lenetSecs))

    # NIN CIFAR-10 train throughput (BASELINE.md names LeNet AND NIN)
    try:
        ninSecs = measureFusedGroups(buildNiN, (3, 32, 32), batch, ksteps, groups=3)
        ninTrain = round(batch / float(np.median(ninSecs)), 1)
    except Exception:
        ninTrain = None

    np.random.seed(0)
    data = np.random.randn(ksteps * batch, 1, 28, 28).astype(np.float32)
    labels = np.random.randint(0, 10, size=(ksteps * batch, )).astype(np.int32)

    # -- eager (reference-style per-op dispatch) baseline --------------------
    netE = buildNet()
    optE = MomentumSGD(learnRate=0.01, momRate=0.9)
    optE.setupOn(netE, useGlobalState=False)
    costE = CrossEntropy()

    dataDev1 = gpuarray.to_gpu(data[:batch])
    labelsDev1 = gpuarray.to_gpu(labels[:batch])

    def eagerStep():
        grad = costE(netE(dataDev1), labelsDev1, queryError=False)
        optE.zeroGradParams()
        netE.backward(grad, updGrad=False)
        optE.update()
        netE.reset()

    # the eager baseline pays the multi-ms relay dispatch on every op; two
    # timed steps bound its wall-clock cost while the ~200x ratio stays stable
    eagerSec = timeSteps(eagerStep, lambda: np.asarray(netE[-1].b.jax), warmup=1, iters=2)

    imagesPerSec = batch / fusedSec

    result = {
        "metric": "lenet_train_images_per_sec",
        "value": round(imagesPerSec, 1),
        "unit": "images/sec",
        # the reference publishes no numbers (BASELINE.md), so the only honest
        # ratio is fused-step speedup over this repo's own eager module-by-module
        # mode — NOT a cross-framework comparison
        "vs_baseline": round(eagerSec / fusedSec, 2),
        "vs_baseline_meaning": "fused step speedup vs own eager mode (reference publishes no numbers)",
        # run-to-run spread over independently timed groups: the relay's
        # variance, which explains the ~20% cross-round drift of this metric
        "spread_images_per_sec": {
            "min": round(batch / max(lenetSecs), 1),
            "median": round(imagesPerSec, 1),
            "max": round(batch / min(lenetSecs), 1),
        },
    }

    if ninTrain is not None:
        result["nin_cifar_train_images_per_sec"] = ninTrain

    print(json.dumps(result))


if __name__ == "__main__":
    main()
