"""LeNet/MNIST training (reference: /root/reference/TestLib/CnnMnistLenet.py)."""

import numpy as np

from puzzlelib_tpu.datasets import MnistLoader
from puzzlelib_tpu.visual import showFilters
from puzzlelib_tpu.handlers import Trainer, Validator
from puzzlelib_tpu.optimizers import MomentumSGD
from puzzlelib_tpu.cost import CrossEntropy

from puzzlelib_tpu.models.nets.lenet import loadLeNet


def main(epochs=15, datapath="testdata/"):
    mnist = MnistLoader()
    data, labels = mnist.load(path=datapath)
    data, labels = data[:], labels[:]
    print("Loaded mnist")

    np.random.seed(1234)
    net = loadLeNet(None, initscheme=None)

    optimizer = MomentumSGD()
    optimizer.setupOn(net, useGlobalState=True)
    optimizer.learnRate = 0.1
    optimizer.momRate = 0.9

    cost = CrossEntropy(maxlabels=10)
    trainer = Trainer(net, cost, optimizer)
    validator = Validator(net, cost)

    for i in range(epochs):
        trainer.trainFromHost(
            data[:60000], labels[:60000], macroBatchSize=60000,
            onMacroBatchFinish=lambda train: print("Train error: %s" % train.cost.getMeanError())
        )
        print("Accuracy: %s" % (1.0 - validator.validateFromHost(data[60000:], labels[60000:],
                                                                 macroBatchSize=10000)))

        optimizer.learnRate *= 0.9

        showFilters(net[0].W.get(), "%s/conv1.png" % datapath)
        showFilters(net[3].W.get(), "%s/conv2.png" % datapath)


if __name__ == "__main__":
    main()
