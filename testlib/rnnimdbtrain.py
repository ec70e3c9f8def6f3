"""LSTM sentiment classification on IMDB.

Behavior parity target: /root/reference/TestLib/RnnIMDBTrain.py — embedding
128, single LSTM 128 with 0.2 dropout, Adam 1e-3, 15 epochs.
"""

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Embedder, SwapAxes, RNN, Linear

from testlib._imdb import batchPlan, runSentiment

NUMWORDS, MAXLEN, EMBSIZE, HSIZE = 20000, 80, 128, 128


def buildNet(numwords=NUMWORDS, maxlen=MAXLEN, hintBatchsize=None):
    net = Sequential()

    net.append(Embedder(numwords, maxlen, EMBSIZE, initscheme="uniform", wscale=0.05, learnable=True))
    net.append(SwapAxes(0, 1))  # (batch, seq, emb) -> (seq, batch, emb) for the RNN
    net.append(RNN(EMBSIZE, HSIZE, mode="lstm", dropout=0.2, hintBatchSize=hintBatchsize))
    net.append(Linear(HSIZE, 1))

    return net


def main(epochs=15, datapath="testdata/"):
    hint, _ = batchPlan()
    runSentiment(lambda: buildNet(hintBatchsize=hint), NUMWORDS, MAXLEN, epochs, datapath)


if __name__ == "__main__":
    main()
