"""Data-parallel CIFAR-10 training on a device grid.

Behavior parity target: /root/reference/TestLib/MultiGPUCifar10.py (2 nodes,
MomentumSGD lr 0.01/0.9, batch 128 split across nodes, 25 epochs, LR halving
on validation plateau).  On TPU the grid maps to devices of the JAX mesh (or
virtual CPU devices via XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

import math

import numpy as np

from puzzlelib_tpu.grid import runGrid

EPOCHS = 25
GLOBAL_BATCH = 128
VAL_SIZE = 10000


def nodeShard(arrays, lo, hi):
    return tuple(a[lo:hi] for a in arrays)


def train(nodeinfo, verbose):
    from puzzlelib_tpu.datasets import Cifar10Loader

    loader = Cifar10Loader(cachename="cifar10-%s.hdf" % nodeinfo.index)
    data, labels = loader.load(path="testdata/")
    data, labels = data[:], labels[:]
    print("[%s]: Loaded cifar10" % nodeinfo.index)

    np.random.seed(1234)

    from testlib.cnncifar10simple import buildNet
    from puzzlelib_tpu.optimizers import MomentumSGD
    from puzzlelib_tpu.cost import CrossEntropy
    from puzzlelib_tpu.handlers import Trainer, Validator

    net = buildNet()

    optimizer = MomentumSGD(learnRate=0.01, momRate=0.9, nodeinfo=nodeinfo)
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=10)
    trainer = Trainer(net, cost, optimizer, batchsize=GLOBAL_BATCH // nodeinfo.gridsize)
    validator = Validator(net, cost)

    trainsize = data.shape[0] - VAL_SIZE
    trainPer, valPer = trainsize // nodeinfo.gridsize, VAL_SIZE // nodeinfo.gridsize

    mySlice = slice(nodeinfo.index * trainPer, (nodeinfo.index + 1) * trainPer)
    myValSlice = slice(trainsize + nodeinfo.index * valPer, trainsize + (nodeinfo.index + 1) * valPer)

    plateau = math.inf

    for epoch in range(1, EPOCHS + 1):
        trainer.trainFromHost(*nodeShard((data, labels), mySlice.start, mySlice.stop),
                              macroBatchSize=trainPer)

        localTrainErr = cost.getMeanError()
        if verbose:
            print("[%s]: Epoch %s local train error: %s" % (nodeinfo.index, epoch, localTrainErr))

        globalTrainErr = nodeinfo.meanValue(localTrainErr)
        if nodeinfo.index == 0:
            print("Epoch %s global train error: %s" % (epoch, globalTrainErr))

        localValErr = validator.validateFromHost(*nodeShard((data, labels), myValSlice.start, myValSlice.stop),
                                                 macroBatchSize=valPer)
        if verbose:
            print("[%s]: Epoch %s local accuracy: %s" % (nodeinfo.index, epoch, 1.0 - localValErr))

        globalValErr = nodeinfo.meanValue(localValErr)
        if nodeinfo.index == 0:
            print("Epoch %s global accuracy: %s" % (epoch, 1.0 - globalValErr))

        if globalValErr >= plateau:
            optimizer.learnRate *= 0.5
            print("[%s]: Lowered learn rate: %s" % (nodeinfo.index, optimizer.learnRate))

        plateau = globalValErr


def main():
    runGrid(target=train, size=2, verbose=True)


if __name__ == "__main__":
    main()
