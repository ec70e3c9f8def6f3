"""Shared IMDB sentiment-training harness for the testlib scripts.

The reference repeats this loop in three scripts (RnnIMDBTrain /
BiRnnIMDBTrain / CnnIMDBTrain); here they share one driver: load IMDB, train
with Adam 1e-3 + BCE for N epochs, report accuracy each epoch.
"""

from puzzlelib_tpu.backend import dnn as Dnn
from puzzlelib_tpu.datasets import IMDBLoader
from puzzlelib_tpu.handlers import Trainer, Validator
from puzzlelib_tpu.optimizers import Adam
from puzzlelib_tpu.cost import BCE

TRAIN_SPLIT = 25000


def batchPlan():
    """(hintBatchsize, batchsize): persistent-kernel hints where supported."""
    return (40, 40) if Dnn.deviceSupportsBatchHint() else (None, 32)


def runSentiment(buildNet, numwords, maxlen, epochs=15, datapath="testdata/"):
    data, labels, _ = IMDBLoader(numwords=numwords, maxlen=maxlen).load(path=datapath)
    data, labels = data[:], labels[:]
    print("Loaded IMDB")

    net = buildNet()

    optimizer = Adam(alpha=1e-3)
    optimizer.setupOn(net, useGlobalState=True)

    cost = BCE()
    _, batchsize = batchPlan()
    trainer = Trainer(net, cost, optimizer, batchsize=batchsize)
    validator = Validator(net, cost, batchsize=batchsize)

    print("Started training ...")
    for _ in range(epochs):
        trainer.trainFromHost(
            data[:TRAIN_SPLIT], labels[:TRAIN_SPLIT], macroBatchSize=TRAIN_SPLIT,
            onMacroBatchFinish=lambda tr: print("Train error: %s" % tr.cost.getMeanError())
        )

        valerr = validator.validateFromHost(data[TRAIN_SPLIT:], labels[TRAIN_SPLIT:],
                                            macroBatchSize=TRAIN_SPLIT)
        print("Accuracy: %s" % (1.0 - valerr))
