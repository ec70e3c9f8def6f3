"""Network-in-Network on CIFAR-10 (reference: /root/reference/TestLib/CnnCifar10NIN.py)."""

import numpy as np

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv2D, Activation, relu, MaxPool2D, Dropout, AvgPool2D, Flatten
from puzzlelib_tpu.datasets import Cifar10Loader
from puzzlelib_tpu.visual import showImageBasedFilters, showFilters
from puzzlelib_tpu.optimizers import hooks as Hooks
from puzzlelib_tpu.optimizers import MomentumSGD
from puzzlelib_tpu.handlers import Trainer, Validator
from puzzlelib_tpu.cost import CrossEntropy


def buildNet():
    seq = Sequential(name="cifar")

    seq.append(Conv2D(3, 192, 5, pad=2, initscheme="gaussian", wscale=0.05, name="conv1"))
    seq.append(Activation(relu, name="relu1"))
    seq.append(Conv2D(192, 160, 1, initscheme="gaussian", wscale=0.05, name="cccp1"))
    seq.append(Activation(relu, name="relu_cccp1"))
    seq.append(Conv2D(160, 96, 1, initscheme="gaussian", wscale=0.05, name="cccp2"))
    seq.append(Activation(relu, name="relu_cccp2"))
    seq.append(MaxPool2D(3, 2, pad=1, name="pool1"))
    seq.append(Dropout(name="drop3"))

    seq.append(Conv2D(96, 192, 5, pad=2, initscheme="gaussian", wscale=0.05, name="conv2"))
    seq.append(Activation(relu, name="relu2"))
    seq.append(Conv2D(192, 192, 1, initscheme="gaussian", wscale=0.05, name="cccp3"))
    seq.append(Activation(relu, name="relu_cccp3"))
    seq.append(Conv2D(192, 192, 1, initscheme="gaussian", wscale=0.05, name="cccp4"))
    seq.append(Activation(relu, name="relu_cccp4"))
    seq.append(AvgPool2D(3, 2, pad=1, name="pool2"))
    seq.append(Dropout(name="drop6"))

    seq.append(Conv2D(192, 192, 3, pad=1, initscheme="gaussian", wscale=0.05, name="conv3"))
    seq.append(Activation(relu, name="relu3"))
    seq.append(Conv2D(192, 192, 1, initscheme="gaussian", wscale=0.05, name="cccp5"))
    seq.append(Activation(relu, name="relu_cccp5"))
    seq.append(Conv2D(192, 10, 1, initscheme="gaussian", wscale=0.05, name="cccp6"))
    seq.append(Activation(relu, name="relu_cccp6"))
    seq.append(AvgPool2D(8, 1, name="pool3"))
    seq.append(Flatten())

    return seq


def main(epochs=100, datapath="testdata/"):
    cifar10 = Cifar10Loader()
    data, labels = cifar10.load(path=datapath)
    data, labels = data[:], labels[:]
    print("Loaded cifar10")

    data = data.reshape(data.shape[0], -1)
    data -= np.mean(data, axis=0, keepdims=True) + 1e-8
    data /= np.std(data, axis=0, keepdims=True) + 1e-5
    data = data.reshape(data.shape[0], 3, 32, 32)

    np.random.seed(1234)
    net = buildNet()

    optimizer = MomentumSGD(learnRate=0.1, momRate=0.9)
    optimizer.addHook(Hooks.WeightDecay(0.0001))
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=10)

    trainer = Trainer(net, cost, optimizer)
    validator = Validator(net, cost)

    for i in range(epochs):
        trainer.trainFromHost(
            data[:50000], labels[:50000], macroBatchSize=25000,
            onMacroBatchFinish=lambda train: print("Train error: %s" % train.cost.getMeanError())
        )
        valerror = validator.validateFromHost(data[50000:], labels[50000:], macroBatchSize=10000)
        print("Finished epoch %d out of %d. Val error: %s" % (i + 1, epochs, valerror))

        if i + 1 == 60 or i + 1 == 80:
            optimizer.learnRate *= 0.1
            print("Lowered learn rate: %s" % optimizer.learnRate)

        showImageBasedFilters(net["conv1"].W.get(), "%s/ninconv1.png" % datapath)
        showFilters(net["conv2"].W.get(), "%s/ninconv2.png" % datapath)
        showFilters(net["conv3"].W.get(), "%s/ninconv3.png" % datapath)


if __name__ == "__main__":
    main()
