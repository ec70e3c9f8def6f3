"""1D-CNN sentiment on IMDB (reference: /root/reference/TestLib/CnnIMDBTrain.py)."""

from puzzlelib_tpu.datasets import IMDBLoader
from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import (
    Embedder, Dropout, SwapAxes, Conv1D, Activation, relu, MaxPool1D, Flatten, Linear
)
from puzzlelib_tpu.handlers import Trainer, Validator
from puzzlelib_tpu.optimizers import Adam
from puzzlelib_tpu.cost import BCE


def buildNet(numwords, maxlen, embsize):
    seq = Sequential()

    seq.append(Embedder(numwords, maxlen, embsize, initscheme="uniform", wscale=0.05, learnable=True))
    seq.append(Dropout(p=0.2))
    seq.append(SwapAxes(1, 2))

    seq.append(Conv1D(embsize, embsize, 3))
    seq.append(Activation(relu))
    seq.append(MaxPool1D(maxlen - 2, 1))
    seq.append(Flatten())

    seq.append(Linear(embsize, 250))
    seq.append(Dropout(p=0.2))
    seq.append(Activation(relu))

    seq.append(Linear(250, 1))

    return seq


def main(epochs=15, datapath="testdata/"):
    numwords, maxlen, embsize = 5000, 250, 50

    imdb = IMDBLoader(numwords=numwords, maxlen=maxlen)
    data, labels, _ = imdb.load(path=datapath)
    data, labels = data[:], labels[:]
    print("Loaded IMDB")

    net = buildNet(numwords, maxlen, embsize)

    optimizer = Adam(alpha=1e-3)
    optimizer.setupOn(net, useGlobalState=True)

    cost = BCE()
    trainer = Trainer(net, cost, optimizer, batchsize=32)
    validator = Validator(net, cost, batchsize=32)

    for i in range(epochs):
        trainer.trainFromHost(
            data[:25000], labels[:25000], macroBatchSize=25000,
            onMacroBatchFinish=lambda train: print("Train error: %s" % train.cost.getMeanError())
        )
        print("Accuracy: %s" % (1.0 - validator.validateFromHost(data[25000:], labels[25000:],
                                                                 macroBatchSize=25000)))


if __name__ == "__main__":
    main()
