"""Data-parallel LeNet/MNIST on a device grid
(reference: /root/reference/TestLib/MultiGPUMnist.py)."""

import numpy as np

from puzzlelib_tpu.grid import runGrid


def train(nodeinfo):
    from puzzlelib_tpu.datasets import MnistLoader

    mnist = MnistLoader(cachename="mnist-%s.hdf" % nodeinfo.index)
    data, labels = mnist.load(path="testdata/")
    data, labels = data[:], labels[:]
    print("[%s]: Loaded mnist" % nodeinfo.index)

    np.random.seed(1234)

    from puzzlelib_tpu.models.nets.lenet import loadLeNet
    net = loadLeNet(None, initscheme=None)

    from puzzlelib_tpu.optimizers import MomentumSGD
    optimizer = MomentumSGD(learnRate=0.1, momRate=0.9, nodeinfo=nodeinfo)
    optimizer.setupOn(net, useGlobalState=True)

    from puzzlelib_tpu.cost import CrossEntropy
    cost = CrossEntropy(maxlabels=10)

    from puzzlelib_tpu.handlers import Trainer, Validator
    trainer = Trainer(net, cost, optimizer, batchsize=128 // nodeinfo.gridsize)
    validator = Validator(net, cost)

    trainsize, valsize = 60000, 10000
    trainpart = trainsize // nodeinfo.gridsize
    valpart = valsize // nodeinfo.gridsize

    for i in range(15):
        start, end = nodeinfo.index * trainpart, (nodeinfo.index + 1) * trainpart
        trainer.trainFromHost(data[start:end], labels[start:end], macroBatchSize=trainpart)

        trerr = nodeinfo.meanValue(cost.getMeanError())
        if nodeinfo.index == 0:
            print("Epoch %s global train error: %s" % (i + 1, trerr))

        start = trainsize + nodeinfo.index * valpart
        end = trainsize + (nodeinfo.index + 1) * valpart

        valerr = nodeinfo.meanValue(
            validator.validateFromHost(data[start:end], labels[start:end], macroBatchSize=valpart)
        )
        if nodeinfo.index == 0:
            print("Epoch %s global accuracy: %s" % (i + 1, 1.0 - valerr))

        optimizer.learnRate *= 0.9


def main():
    runGrid(target=train, size=2)


if __name__ == "__main__":
    main()
