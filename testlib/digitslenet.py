"""LeNet on the UCI handwritten-digits dataset — real-data accuracy evidence.

The canonical reference demo trains LeNet to ~99% on MNIST
(/root/reference/TestLib/CnnMnistLenet.py:30-37).  MNIST itself is not
obtainable in this offline environment, so this uses the only real
handwritten-digit dataset available (sklearn's bundled UCI digits: 1797
8x8 images), upsampled to LeNet's 28x28 input.  Same net topology, same
trainer/validator flow, accuracy target >=97% on the held-out split.

Run:  python testlib/digitslenet.py [epochs]
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

    # 8x8 -> 28x28 nearest-ish upsample with a 2px border (LeNet geometry)
    up = np.repeat(np.repeat(images, 3, axis=1), 3, axis=2)   # 24x24
    data = np.zeros((len(images), 1, 28, 28), np.float32)
    data[:, 0, 2:26, 2:26] = up

    rng = np.random.RandomState(0)
    order = rng.permutation(len(images))
    data, labels = data[order], labels[order]

    split = 1500
    return data[:split], labels[:split], data[split:], labels[split:]


def buildLeNet():
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Activation, relu, Flatten, Linear

    seq = Sequential()
    seq.append(Conv2D(1, 16, 3, pad=1, initscheme="he"))
    seq.append(MaxPool2D())
    seq.append(Activation(relu))

    seq.append(Conv2D(16, 32, 4, pad=1, initscheme="he"))
    seq.append(MaxPool2D())
    seq.append(Activation(relu))

    seq.append(Flatten())
    seq.append(Linear(32 * 6 * 6, 1024, initscheme="he"))
    seq.append(Activation(relu))
    seq.append(Linear(1024, 10))

    return seq


def main(epochs=15):
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.fused import FusedTrainer
    from puzzlelib_tpu.handlers import Validator

    np.random.seed(0)

    trainX, trainY, valX, valY = loadDigits()
    net = buildLeNet()

    optimizer = MomentumSGD(learnRate=0.01, momRate=0.9)
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=10)
    trainer = FusedTrainer(net, cost, optimizer, batchsize=100)
    validator = Validator(net, cost, batchsize=99)

    accuracy = 0.0
    for epoch in range(epochs):
        trainer.trainFromHost(trainX, trainY, macroBatchSize=1500,
                              onMacroBatchFinish=lambda t: None)
        accuracy = 1.0 - validator.validateFromHost(valX, valY, macroBatchSize=297)
        print("Epoch %2d: train loss %.4f, val accuracy %.4f"
              % (epoch + 1, cost.getMeanError(), accuracy), flush=True)

    assert accuracy >= 0.97, "accuracy target missed: %.4f" % accuracy
    print("final val accuracy: %.4f (>= 0.97 target)" % accuracy)
    return accuracy


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
