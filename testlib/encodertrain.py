"""Tied-weight MNIST autoencoder (reference: /root/reference/TestLib/EncoderTrain.py)."""

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


def buildEncoder():
    seq = Sequential()

    seq.append(Linear(784, 256))
    seq.append(Activation(relu, inplace=True))
    seq.append(Dropout())

    seq.append(Linear(256, 784, empty=True, transpose=True))
    seq[-1].setVar("W", seq[0].vars["W"])
    seq[-1].setVar("b", Variable(gpuarray.zeros((784, ), dtype=np.float32, allocator=memPool)))

    return seq


def main(epochs=40, datapath="testdata/"):
    mnist = MnistLoader()
    data, _ = mnist.load(path=datapath)
    data = data[:].reshape(data.shape[0], -1)
    print("Loaded mnist")

    np.random.seed(1234)
    net = buildEncoder()

    optimizer = MomentumSGD()
    optimizer.setupOn(net, useGlobalState=True)
    optimizer.learnRate = 10.0
    optimizer.momRate = 0.5

    data = gpuarray.to_gpu(data)

    batchsize = 100
    mse = MSE()

    for epoch in range(epochs):
        for i in range(data.shape[0] // batchsize):
            batch = data[i * batchsize:(i + 1) * batchsize]

            net(batch)
            _, grad = mse(net.data, batch)

            net.zeroGradParams()
            net.backward(grad)
            optimizer.update()

        optimizer.learnRate *= 0.8
        print("Finished epoch %d" % (epoch + 1))
        print("Error: %s" % mse.getMeanError())
        mse.resetAccumulator()

        if (epoch + 1) % 5 == 0:
            filters = net[0].W.get().T
            showFilters(filters.reshape(16, 16, 28, 28), "%s/encoder.png" % datapath)


if __name__ == "__main__":
    main()
