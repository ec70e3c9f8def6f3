"""1D-CNN sentiment classification on IMDB.

Behavior parity target: /root/reference/TestLib/CnnIMDBTrain.py — embedding
50, one Conv1D(k=3) + global max pool, 250-unit head, Adam 1e-3.
"""

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import (
    Embedder, Dropout, SwapAxes, Conv1D, Activation, relu, MaxPool1D, Flatten, Linear
)

from testlib._imdb import runSentiment

NUMWORDS, MAXLEN, EMBSIZE = 5000, 250, 50


def buildNet(numwords=NUMWORDS, maxlen=MAXLEN, embsize=EMBSIZE):
    net = Sequential()

    net.append(Embedder(numwords, maxlen, embsize, initscheme="uniform", wscale=0.05, learnable=True))
    net.append(Dropout(p=0.2))
    net.append(SwapAxes(1, 2))  # (batch, seq, emb) -> (batch, emb, seq) for Conv1D

    net.append(Conv1D(embsize, embsize, 3))
    net.append(Activation(relu))
    net.append(MaxPool1D(maxlen - 2, 1))  # global max over the sequence
    net.append(Flatten())

    net.append(Linear(embsize, 250))
    net.append(Dropout(p=0.2))
    net.append(Activation(relu))
    net.append(Linear(250, 1))

    return net


def main(epochs=15, datapath="testdata/"):
    runSentiment(buildNet, NUMWORDS, MAXLEN, epochs, datapath)


if __name__ == "__main__":
    main()
