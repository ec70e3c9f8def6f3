"""Tied-weight MNIST autoencoder.

Behavior parity target: /root/reference/TestLib/EncoderTrain.py — 784-256-784
with the decoder reusing the encoder weight transposed, MomentumSGD lr 10.0
x0.8/epoch, 40 epochs, filter dumps every 5.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Linear, Activation, relu, Dropout
from puzzlelib_tpu.datasets import MnistLoader
from puzzlelib_tpu.visual import showFilters
from puzzlelib_tpu.optimizers import MomentumSGD
from puzzlelib_tpu.cost import MSE
from puzzlelib_tpu.variable import Variable

HIDDEN = 256
PIXELS = 784


def buildEncoder():
    net = Sequential()

    net.append(Linear(PIXELS, HIDDEN))
    net.append(Activation(relu, inplace=True))
    net.append(Dropout())

    # decoder shares the encoder weight, applied transposed
    decoder = Linear(HIDDEN, PIXELS, empty=True, transpose=True)
    decoder.setVar("W", net[0].vars["W"])
    decoder.setVar("b", Variable(gpuarray.zeros((PIXELS, ), dtype=np.float32, allocator=memPool)))
    net.append(decoder)

    return net


def trainEpoch(net, mse, optimizer, data, batchsize):
    for i in range(data.shape[0] // batchsize):
        batch = data[i * batchsize:(i + 1) * batchsize]

        _, grad = mse(net(batch), batch)

        net.zeroGradParams()
        net.backward(grad)
        optimizer.update()


def main(epochs=40, datapath="testdata/"):
    data, _ = MnistLoader().load(path=datapath)
    data = data[:].reshape(data.shape[0], -1)
    print("Loaded mnist")

    np.random.seed(1234)
    net = buildEncoder()

    optimizer = MomentumSGD()
    optimizer.setupOn(net, useGlobalState=True)
    optimizer.learnRate, optimizer.momRate = 10.0, 0.5

    data = gpuarray.to_gpu(data)
    mse = MSE()

    for epoch in range(1, epochs + 1):
        trainEpoch(net, mse, optimizer, data, batchsize=100)
        optimizer.learnRate *= 0.8

        print("Finished epoch %d" % epoch)
        print("Error: %s" % mse.getMeanError())
        mse.resetAccumulator()

        if epoch % 5 == 0:
            firstLayer = net[0].W.get().T
            showFilters(firstLayer.reshape(16, 16, 28, 28), "%s/encoder.png" % datapath)


if __name__ == "__main__":
    main()
