"""End-to-end public-API drive on the current backend (the /verify recipe).

Builds a small CNN through the user-facing Module/Container API, trains it
with the Trainer handler (macro-batching, fused-global-state optimizer),
validates, runs batched inference, round-trips an HDF5 checkpoint through the
Blueprint loader, and exercises a verifyData error path.  Small shapes keep
remote TPU compiles bounded; the persistent compile cache is enabled.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Activation, relu, Flatten, Linear
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.handlers import Trainer, Validator, Calculator
    from puzzlelib_tpu.blueprint import load as bpLoad

    np.random.seed(0)
    n, cls = 512, 10
    data = np.random.randn(n, 1, 12, 12).astype(np.float32)
    w = np.random.randn(cls, 1 * 12 * 12).astype(np.float32)
    labels = np.argmax(data.reshape(n, -1) @ w.T, axis=1).astype(np.int32)

    net = Sequential(name="drive")
    net.append(Conv2D(1, 8, 3, pad=1))
    net.append(Activation(relu))
    net.append(MaxPool2D())
    net.append(Flatten())
    net.append(Linear(8 * 6 * 6, cls))

    cost = CrossEntropy()
    opt = MomentumSGD(learnRate=0.05, momRate=0.9)
    opt.setupOn(net, useGlobalState=True)

    trainer = Trainer(net, cost, opt, batchsize=64)
    validator = Validator(net, cost, batchsize=64)

    errs = []
    for _ in range(6):
        trainer.trainFromHost(data, labels, macroBatchSize=256)
        errs.append(cost.getMeanError())
        cost.resetAccumulator()

    print("train errors:", ["%.3f" % e for e in errs])
    assert errs[-1] < errs[0] * 0.7, "loss did not decrease"

    verr = validator.validateFromHost(data, labels, macroBatchSize=256)
    print("val error: %.3f" % verr)
    assert verr < 0.5

    preds = Calculator(net, batchsize=64).calcFromHost(data, macroBatchSize=256)
    acc = float(np.mean(np.argmax(preds, axis=1) == labels))
    print("accuracy: %.3f" % acc)
    assert acc > 0.6

    path = "/tmp/verify_drive_ckpt.hdf"
    net.save(path, withBlueprint=True)
    net2 = bpLoad(path)
    p2 = Calculator(net2, batchsize=64).calcFromHost(data[:64])
    assert np.allclose(np.asarray(preds[:64]), np.asarray(p2), atol=1e-5)
    print("checkpoint round-trip OK")

    from puzzlelib_tpu.backend import gpuarray
    try:
        net(gpuarray.to_gpu(np.random.randn(4, 3, 12, 12).astype(np.float32)))
        raise SystemExit("expected a shape error")
    except SystemExit:
        raise
    except Exception as exc:
        print("shape error raised as expected: %s" % str(exc)[:70])

    print("DRIVE OK")


if __name__ == "__main__":
    main()
