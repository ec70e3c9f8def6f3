"""BiLSTM sentiment classification on IMDB.

Behavior parity target: /root/reference/TestLib/BiRnnIMDBTrain.py — embedding
128, bidirectional LSTM 64 (concatenated to 128), dropout 0.5, Adam 1e-3.
"""

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Embedder, SwapAxes, RNN, Concat, Dropout, Linear

from testlib._imdb import batchPlan, runSentiment

NUMWORDS, MAXLEN = 20000, 100


def buildNet(numwords=NUMWORDS, maxlen=MAXLEN, hintBatchsize=None):
    net = Sequential()

    net.append(Embedder(numwords, maxlen, 128, initscheme="uniform", wscale=0.05, learnable=True))
    net.append(SwapAxes(0, 1))
    net.append(RNN(128, 64, mode="lstm", direction="bi", hintBatchSize=hintBatchsize))
    net.append(Concat(axis=1))  # fwd/bwd halves -> one 128 feature vector
    net.append(Dropout(p=0.5))
    net.append(Linear(128, 1))

    return net


def main(epochs=15, datapath="testdata/"):
    hint, _ = batchPlan()
    runSentiment(lambda: buildNet(hintBatchsize=hint), NUMWORDS, MAXLEN, epochs, datapath)


if __name__ == "__main__":
    main()
