"""Real-data analogues of the remaining BASELINE benchmark configs.

The reference's accuracy demos run on MNIST / IMDB, neither obtainable in
this offline environment; the UCI handwritten-digits dataset (sklearn's
bundled copy — 1797 real 8x8 images) stands in:

- ``autoencoder``: tied-weight autoencoder (64-32-64, decoder reuses the
  encoder weight transposed) — the EncoderTrain config
  (/root/reference/TestLib/EncoderTrain.py:30-60).  Gate: reconstruction
  MSE falls below 0.01.
- ``lstm``: an LSTM reads each image as an 8-step sequence of rows and
  classifies the digit — the RnnIMDBTrain sequence-classification flow
  (/root/reference/TestLib/RnnIMDBTrain.py:23-51).  Gate: >=95% held-out
  accuracy.

Run:  python testlib/digitsreal.py [autoencoder|lstm|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def loadDigits():
    from sklearn.datasets import load_digits

    digits = load_digits()
    images = digits.images.astype(np.float32) / 16.0          # (1797, 8, 8)
    labels = digits.target.astype(np.int32)

    rng = np.random.RandomState(0)
    order = rng.permutation(len(images))
    return images[order], labels[order]


def runAutoencoder(epochs=40):
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Linear, Activation, sigmoid
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.cost import MSE
    from puzzlelib_tpu.variable import Variable

    np.random.seed(0)
    images, _ = loadDigits()
    data = images.reshape(-1, 64)

    net = Sequential()
    net.append(Linear(64, 32))
    net.append(Activation(sigmoid))

    decoder = Linear(32, 64, empty=True, transpose=True)
    decoder.setVar("W", net[0].vars["W"])          # tied weight, transposed
    decoder.setVar("b", Variable(gpuarray.zeros((64, ), dtype=np.float32)))
    net.append(decoder)

    optimizer = MomentumSGD(learnRate=2.0, momRate=0.9)
    optimizer.setupOn(net, useGlobalState=True)
    mse = MSE()

    batchsize = 100
    err = None
    for epoch in range(epochs):
        for i in range(data.shape[0] // batchsize):
            batch = gpuarray.to_gpu(data[i * batchsize:(i + 1) * batchsize])
            _, grad = mse(net(batch), batch)
            net.zeroGradParams()
            net.backward(grad)
            optimizer.update()
            net.reset()

        err = mse.getMeanError()
        if (epoch + 1) % 10 == 0:
            print("autoencoder epoch %2d: MSE %.5f" % (epoch + 1, err), flush=True)
        optimizer.learnRate *= 0.95

    assert err < 0.01, "autoencoder MSE gate missed: %.5f" % err
    print("autoencoder final MSE %.5f (< 0.01 gate, tied decoder weight)" % err)
    return err


def runLstm(epochs=40):
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import RNN, Linear, SwapAxes
    from puzzlelib_tpu.optimizers import Adam
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.fused import FusedTrainer
    from puzzlelib_tpu.handlers import Validator

    np.random.seed(1)
    images, labels = loadDigits()

    # each image is an 8-step sequence of rows; SwapAxes feeds the RNN
    # (batch, seq, in) -> (seq, batch, in), the RnnIMDBTrain pattern
    split = 1500
    trainX, valX = images[:split], images[split:]
    trainY, valY = labels[:split], labels[split:]

    net = Sequential()
    net.append(SwapAxes(0, 1))
    net.append(RNN(8, 64, mode="lstm", getSequences=False))
    net.append(Linear(64, 10))

    optimizer = Adam(alpha=3e-3)
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=10)
    trainer = FusedTrainer(net, cost, optimizer, batchsize=100)
    validator = Validator(net, cost, batchsize=99)

    accuracy = 0.0
    for epoch in range(epochs):
        trainer.trainFromHost(trainX, trainY, macroBatchSize=split)
        accuracy = 1.0 - validator.validateFromHost(valX, valY, macroBatchSize=297)
        if (epoch + 1) % 5 == 0:
            print("lstm epoch %2d: loss %.4f, val accuracy %.4f"
                  % (epoch + 1, cost.getMeanError(), accuracy), flush=True)

    assert accuracy >= 0.95, "lstm accuracy gate missed: %.4f" % accuracy
    print("lstm final val accuracy %.4f (>= 0.95 gate)" % accuracy)
    return accuracy


def main(which="all"):
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    if which in ("autoencoder", "all"):
        runAutoencoder()
    if which in ("lstm", "all"):
        runLstm()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
