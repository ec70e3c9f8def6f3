"""Network-in-Network on CIFAR-10.

Behavior parity target: /root/reference/TestLib/CnnCifar10NIN.py — three NIN
blocks (5x5/3x3 conv + two 1x1 "cccp" convs), per-feature standardization,
MomentumSGD 0.1/0.9 + 1e-4 weight decay, LR x0.1 at epochs 60 and 80.
"""

import numpy as np

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv2D, Activation, relu, MaxPool2D, Dropout, AvgPool2D, Flatten
from puzzlelib_tpu.datasets import Cifar10Loader
from puzzlelib_tpu.visual import showImageBasedFilters, showFilters
from puzzlelib_tpu.optimizers import hooks as Hooks
from puzzlelib_tpu.optimizers import MomentumSGD
from puzzlelib_tpu.handlers import Trainer, Validator
from puzzlelib_tpu.cost import CrossEntropy

# one NIN block: lead conv + 2 cccp 1x1 convs + pool (+ optional dropout)
NIN_BLOCKS = [
    {"idx": 1, "convs": [(3, 192, 5, 2), (192, 160, 1, 0), (160, 96, 1, 0)],
     "pool": (MaxPool2D, 3, 2, 1), "dropout": "drop3"},
    {"idx": 2, "convs": [(96, 192, 5, 2), (192, 192, 1, 0), (192, 192, 1, 0)],
     "pool": (AvgPool2D, 3, 2, 1), "dropout": "drop6"},
    {"idx": 3, "convs": [(192, 192, 3, 1), (192, 192, 1, 0), (192, 10, 1, 0)],
     "pool": (AvgPool2D, 8, 1, 0), "dropout": None},
]


def buildNet():
    seq = Sequential(name="cifar")
    cccp = 0

    for block in NIN_BLOCKS:
        for k, (inmaps, outmaps, size, pad) in enumerate(block["convs"]):
            if k == 0:
                convName, reluName = "conv%d" % block["idx"], "relu%d" % block["idx"]
            else:
                cccp += 1
                convName, reluName = "cccp%d" % cccp, "relu_cccp%d" % cccp

            seq.append(Conv2D(inmaps, outmaps, size, pad=pad, initscheme="gaussian",
                              wscale=0.05, name=convName))
            seq.append(Activation(relu, name=reluName))

        poolCls, size, stride, pad = block["pool"]
        seq.append(poolCls(size, stride, pad=pad, name="pool%d" % block["idx"]))

        if block["dropout"]:
            seq.append(Dropout(name=block["dropout"]))

    seq.append(Flatten())
    return seq


def standardize(data):
    flat = data.reshape(data.shape[0], -1)
    flat -= flat.mean(axis=0, keepdims=True) + 1e-8
    flat /= flat.std(axis=0, keepdims=True) + 1e-5

    return flat.reshape(data.shape[0], 3, 32, 32)


def main(epochs=100, datapath="testdata/"):
    data, labels = Cifar10Loader().load(path=datapath)
    data, labels = standardize(data[:]), labels[:]
    print("Loaded cifar10")

    np.random.seed(1234)
    net = buildNet()

    optimizer = MomentumSGD(learnRate=0.1, momRate=0.9)
    optimizer.addHook(Hooks.WeightDecay(0.0001))
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=10)
    trainer, validator = Trainer(net, cost, optimizer), Validator(net, cost)

    for epoch in range(1, epochs + 1):
        trainer.trainFromHost(
            data[:50000], labels[:50000], macroBatchSize=25000,
            onMacroBatchFinish=lambda train: print("Train error: %s" % train.cost.getMeanError())
        )

        valerror = validator.validateFromHost(data[50000:], labels[50000:], macroBatchSize=10000)
        print("Finished epoch %d out of %d. Val error: %s" % (epoch, epochs, valerror))

        if epoch in (60, 80):
            optimizer.learnRate *= 0.1
            print("Lowered learn rate: %s" % optimizer.learnRate)

        showImageBasedFilters(net["conv1"].W.get(), "%s/ninconv1.png" % datapath)
        showFilters(net["conv2"].W.get(), "%s/ninconv2.png" % datapath)
        showFilters(net["conv3"].W.get(), "%s/ninconv3.png" % datapath)


if __name__ == "__main__":
    main()
