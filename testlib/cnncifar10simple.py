"""Simple CNN on CIFAR-10.

Behavior parity target: /root/reference/TestLib/CnnCifar10Simple.py — three
gaussian-initialized conv+pool blocks, two linear layers, MomentumSGD 0.01/0.9
with LR halving on validation plateau.
"""

import math

import numpy as np

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Activation, relu, Flatten, Linear
from puzzlelib_tpu.datasets import Cifar10Loader
from puzzlelib_tpu.visual import showImageBasedFilters, showFilters
from puzzlelib_tpu.handlers import Trainer, Validator
from puzzlelib_tpu.optimizers import MomentumSGD
from puzzlelib_tpu.cost import CrossEntropy

# (inmaps, outmaps, wscale) per conv block; all 5x5 pad 2 + 3x2 maxpool + relu
CONV_BLOCKS = [(3, 32, 0.0001), (32, 32, 0.01), (32, 64, 0.01)]


def buildNet():
    seq = Sequential()

    for inmaps, outmaps, wscale in CONV_BLOCKS:
        seq.append(Conv2D(inmaps, outmaps, 5, pad=2, wscale=wscale, initscheme="gaussian"))
        seq.append(MaxPool2D(3, 2))
        seq.append(Activation(relu))

    seq.append(Flatten())

    flat = seq.dataShapeFrom((1, 3, 32, 32))[1]
    seq.append(Linear(flat, 64, wscale=0.1, initscheme="gaussian"))
    seq.append(Activation(relu))
    seq.append(Linear(64, 10, wscale=0.1, initscheme="gaussian"))

    return seq


def main(epochs=25, datapath="testdata/"):
    data, labels = Cifar10Loader().load(path=datapath)
    data, labels = data[:], labels[:]
    print("Loaded cifar10")

    np.random.seed(1234)
    net = buildNet()

    optimizer = MomentumSGD()
    optimizer.setupOn(net, useGlobalState=True)
    optimizer.learnRate, optimizer.momRate = 0.01, 0.9

    cost = CrossEntropy(maxlabels=10)
    trainer, validator = Trainer(net, cost, optimizer), Validator(net, cost)

    plateau = math.inf

    for _ in range(epochs):
        trainer.trainFromHost(
            data[:50000], labels[:50000], macroBatchSize=50000,
            onMacroBatchFinish=lambda train: print("Train error: %s" % train.cost.getMeanError())
        )

        valerror = validator.validateFromHost(data[50000:], labels[50000:], macroBatchSize=10000)
        print("Accuracy: %s" % (1.0 - valerror))

        if valerror >= plateau:
            optimizer.learnRate *= 0.5
            print("Lowered learn rate: %s" % optimizer.learnRate)

        plateau = valerror

        for layer, dump in ((0, showImageBasedFilters), (3, showFilters), (6, showFilters)):
            dump(net[layer].W.get(), "%s/conv%d.png" % (datapath, layer // 3 + 1))


if __name__ == "__main__":
    main()
