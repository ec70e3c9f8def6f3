"""LeNet-5-like MNIST net (reference: /root/reference/Models/Nets/LeNet.py)."""

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv2D, MaxPool2D, Activation, relu, Flatten, Linear


def loadLeNet(modelpath, initscheme="none", name="lenet-5-like"):
    net = Sequential(name=name)

    net.append(Conv2D(1, 16, 3, initscheme=initscheme))
    net.append(MaxPool2D())
    net.append(Activation(relu))

    net.append(Conv2D(16, 32, 4, initscheme=initscheme))
    net.append(MaxPool2D())
    net.append(Activation(relu))

    net.append(Flatten())
    net.append(Linear(32 * 5 * 5, 1024, initscheme=initscheme))
    net.append(Activation(relu))

    net.append(Linear(1024, 10, initscheme=initscheme))

    if modelpath is not None:
        net.load(modelpath)

    return net
