"""Transformer sentiment on IMDB — TPU-extension companion to
testlib/rnnimdbtrain.py (the reference has no attention models).

Same data pipeline as the RNN script, with a pre-norm transformer encoder and
the fused multi-step trainer.
"""

from puzzlelib_tpu.models.nets.transformer import buildTransformerClassifier
from puzzlelib_tpu.datasets import IMDBLoader
from puzzlelib_tpu.handlers import Validator
from puzzlelib_tpu.fused import FusedTrainer
from puzzlelib_tpu.optimizers import Adam
from puzzlelib_tpu.cost import CrossEntropy


def buildNet(numwords, maxlen, attnAlgo="xla"):
    return buildTransformerClassifier(
        numwords, maxlen, embsize=128, nheads=4, nlayers=2, nclasses=2,
        attnAlgo=attnAlgo, name="imdb-transformer"
    )


def main(epochs=10, datapath="testdata/", batchsize=64):
    numwords, maxlen = 20000, 80

    imdb = IMDBLoader(numwords=numwords, maxlen=maxlen)
    data, labels, _ = imdb.load(path=datapath)
    print("Loaded IMDB")

    net = buildNet(numwords, maxlen)

    optimizer = Adam(alpha=1e-3)
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=2)
    trainer = FusedTrainer(net, cost, optimizer, batchsize=batchsize, stepsPerDispatch=4)
    validator = Validator(net, cost, batchsize=batchsize)

    print("Started training ...")
    for i in range(epochs):
        trainer.trainFromHost(
            data[:25000], labels[:25000].astype("int32"), macroBatchSize=25000,
            onMacroBatchFinish=lambda train: print("Train error: %s" % train.cost.getMeanError())
        )

        accuracy = 1.0 - validator.validateFromHost(
            data[25000:], labels[25000:].astype("int32"), macroBatchSize=25000
        )
        print("Epoch %d accuracy: %s" % (i + 1, accuracy))

        optimizer.alpha *= 0.9


if __name__ == "__main__":
    main()
