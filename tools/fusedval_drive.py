"""On-chip drive for FusedValidator / FusedCalculator: numerics vs the eager
handlers and the dispatch-count win in wall-clock.

The eager Validator/Calculator pay one relay dispatch per module op; the fused
variants pay one per batch (validation additionally reads the error back once
per call instead of once per batch).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import (
        Conv2D, MaxPool2D, Activation, relu, Flatten, Linear, BatchNorm2D
    )
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.handlers import Validator, Calculator
    from puzzlelib_tpu.fused import FusedValidator, FusedCalculator

    def buildNet():
        np.random.seed(42)
        seq = Sequential()
        seq.append(Conv2D(3, 16, 3))
        seq.append(BatchNorm2D(16))
        seq.append(MaxPool2D())
        seq.append(Activation(relu))
        seq.append(Conv2D(16, 32, 3))
        seq.append(MaxPool2D())
        seq.append(Activation(relu))
        seq.append(Flatten())
        seq.append(Linear(32 * 6 * 6, 10))
        return seq

    np.random.seed(9)
    n = 1024
    data = np.random.randn(n, 3, 32, 32).astype(np.float32)
    labels = np.random.randint(0, 10, size=(n, )).astype(np.int32)

    # numerics: fused == eager
    refErr = Validator(buildNet(), CrossEntropy(), batchsize=128).validateFromHost(data, labels)
    t = time.time()
    gotErr = FusedValidator(buildNet(), CrossEntropy(), batchsize=128).validateFromHost(data, labels)
    fusedCold = time.time() - t

    print("validator: eager %.6f fused %.6f (|d|=%.2e, fused cold %.1fs)" %
          (refErr, gotErr, abs(refErr - gotErr), fusedCold), flush=True)
    assert abs(refErr - gotErr) < 1e-6

    refOut = Calculator(buildNet(), batchsize=128).calcFromHost(data)
    gotOut = FusedCalculator(buildNet(), batchsize=128).calcFromHost(data)
    print("calculator: max|d| = %.2e" % float(np.abs(refOut - gotOut).max()), flush=True)
    assert np.allclose(refOut, gotOut, atol=1e-5)

    # wall-clock: one warm validate sweep each
    eagerVal = Validator(buildNet(), CrossEntropy(), batchsize=128)
    eagerVal.validateFromHost(data[:256], labels[:256])      # warm executables
    t = time.time()
    eagerVal.validateFromHost(data, labels)
    tEager = time.time() - t

    fusedVal = FusedValidator(buildNet(), CrossEntropy(), batchsize=128)
    fusedVal.validateFromHost(data[:256], labels[:256])
    t = time.time()
    fusedVal.validateFromHost(data, labels)
    tFused = time.time() - t

    print("validate 1024 samples b128: eager %.3fs, fused %.3fs (%.1fx)" %
          (tEager, tFused, tEager / max(tFused, 1e-9)), flush=True)


if __name__ == "__main__":
    main()
