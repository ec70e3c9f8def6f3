"""Pipeline + mixture-of-experts training across a device mesh, built
entirely from Modules/Containers.

The reference's standard is that users compose nets from Modules and
Containers (/root/reference/Containers/Sequential.py discipline) and its
multi-device story is the TestLib grid scripts
(/root/reference/TestLib/MultiGPUMnist.py).  This script is the
TPU-native extension of both: a `Pipeline` container whose stages each
hold a Linear trunk and a `SwitchMoE` expert layer trains on the UCI
digits data with the GPipe schedule over a mesh "stage" axis — stage
weights live one-per-device, activations ride `lax.ppermute` over ICI,
and the whole fwd+bwd is one compiled XLA program per step.  The
optimizer stays the ordinary Module-protocol `MomentumSGD`; stacked
stage gradients are folded back into each stage Module's Variables
(`Pipeline.foldStageGrads`), so checkpointing/blueprints keep working.

Run:  python testlib/pipelinemoe.py [epochs]
      (runs on an 8-virtual-device CPU mesh — the GPipe schedule needs one
      device per stage, and this environment exposes a single TPU chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PUZZLE_BACKEND"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


N_STAGES = 4
DIM = 64          # 8x8 digits, flattened
N_CLASSES = 10


def loadDigits():
    from sklearn.datasets import load_digits

    digits = load_digits()
    data = (digits.images.astype(np.float32) / 16.0).reshape(-1, DIM)
    labels = digits.target.astype(np.int32)

    rng = np.random.RandomState(0)
    order = rng.permutation(len(data))
    data, labels = data[order], labels[order]

    split = 1536          # divisible by batch 128; val trimmed to 256 (4 microbatches)
    return data[:split], labels[:split], data[split:split + 256], labels[split:split + 256]


def makeStage(index):
    """One pipeline stage, transformer-block shaped: a Linear+tanh trunk with
    a RESIDUAL top-1 MoE branch (capacity drops must not zero tokens — the
    residual keeps the signal path dense).  All stages share this structure
    (the stacked-weights regime GPipe needs); weights differ per-module."""
    from puzzlelib_tpu.containers import Graph
    from puzzlelib_tpu.modules import Linear, Activation, tanh, Add, SwitchMoE

    np.random.seed(100 + index)

    inp = Linear(DIM, DIM, wscale=0.5, initscheme="gaussian",
                 name="trunk%d" % index).node()
    act = Activation(tanh, name="trunkact%d" % index).node(inp)

    moe = SwitchMoE(DIM, capacityFactor=2.0, name="moe%d" % index)
    for e in range(4):
        moe.append(Linear(DIM, DIM, wscale=0.3, initscheme="gaussian",
                          name="expert%d" % e))
    moeNode = moe.node(act)

    out = Add(name="res%d" % index).node(act, moeNode)
    return Graph(inputs=inp, outputs=out, name="stage%d" % index)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Pipeline
    from puzzlelib_tpu.optimizers import MomentumSGD

    trainData, trainLabels, valData, valLabels = loadDigits()
    print("digits: %d train / %d val" % (len(trainData), len(valData)))

    pipe = Pipeline(name="trunk")
    for i in range(N_STAGES):
        pipe.append(makeStage(i))

    devices = jax.devices()
    assert len(devices) >= N_STAGES, "need %d devices for the stage axis" % N_STAGES
    mesh = Mesh(np.array(devices[:N_STAGES]), ("stage", ))
    print("mesh: %d device(s) on the stage axis [%s]" % (N_STAGES, devices[0].platform))

    optimizer = MomentumSGD(learnRate=0.05, momRate=0.9)
    optimizer.setupOn(pipe, useGlobalState=False)

    def lossFn(out, tgt):
        # the last stage's first N_CLASSES features are the logits: the
        # trunk is dimension-uniform so the WHOLE net trains in the mesh
        # schedule (no replicated head outside it)
        logits = out[:, :N_CLASSES].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[:, None], axis=1))

    batch = 128

    for epoch in range(epochs):
        losses = []
        for i in range(0, len(trainData), batch):
            x = gpuarray.to_gpu(trainData[i:i + batch])
            t = gpuarray.to_gpu(trainLabels[i:i + batch])

            with mesh:
                loss, grads = pipe.distributedGrad(lossFn, x, t, mesh, microbatches=4)

            pipe.foldStageGrads(grads)
            optimizer.update()
            losses.append(float(loss))

        with mesh:
            out = pipe.distributedForward(gpuarray.to_gpu(valData), mesh,
                                          microbatches=4).get()
        acc = float(np.mean(np.argmax(out[:, :N_CLASSES], axis=1) == valLabels))
        print("epoch %2d: train loss %.4f, val accuracy %.4f"
              % (epoch + 1, float(np.mean(losses)), acc))

        optimizer.learnRate *= 0.93          # the reference scripts' LR decay

    # mesh path == eager Module path: the same container runs as a plain
    # Sequential on one device (inference/serving parity check)
    eagerOut = pipe(gpuarray.to_gpu(valData[:64])).get()
    pipe.reset()
    assert np.allclose(eagerOut[:, :N_CLASSES], out[:64, :N_CLASSES], atol=2e-3), \
        "eager Sequential forward diverges from the mesh schedule"

    print("final val accuracy: %.4f (eager == mesh schedule verified)" % acc)
    # 8x8 raw-pixel digits through a 64-wide residual trunk: ~0.86 plateau
    # at 40 epochs (2026-08-19 run); the gate is mesh-training evidence, not SOTA
    assert acc >= 0.80, "pipeline+MoE training failed to reach 80%% accuracy"


if __name__ == "__main__":
    main()
