"""Finite-difference gradient check (reference: /root/reference/TestLib/GradientCheck.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv2D, AvgPool2D, BatchNorm2D, Activation, relu, Flatten
from puzzlelib_tpu.cost import BCE


def buildNet():
    net = Sequential(name="test-net")

    net.append(Conv2D(1, 2, 3, wscale=1.0, initscheme="gaussian"))
    net.append(AvgPool2D(2, 2))

    net.append(BatchNorm2D(2))
    net.append(Activation(relu))

    net.append(Conv2D(2, 1, 2, wscale=1.0, initscheme="gaussian"))
    net.append(Flatten())

    return net


def gradientCheck(mod, data, target, cost, h=1e-3, log=True):
    """Return per-parameter relative finite-difference errors."""
    vartable = mod.getVarTable()

    mod(data)
    error, grad = cost(mod.data, target)
    mod.backward(grad, updGrad=False)

    relerrors = []

    for var in vartable.keys():
        w = var.data.get()
        dw = -var.grad.get()

        for i in range(w.ravel().shape[0]):
            wph, wmh = np.copy(w), np.copy(w)

            wph.ravel()[i] = w.ravel()[i] + h
            var.data.set(wph)
            yph, _ = cost(mod(data), target)

            wmh.ravel()[i] = w.ravel()[i] - h
            var.data.set(wmh)
            ymh, _ = cost(mod(data), target)

            host = (yph - ymh) / (2.0 * h)
            dev = dw.ravel()[i]
            var.data.set(w)

            rel = abs((host - dev) / (dev + h))
            relerrors.append(rel)

            if log:
                print(rel)

    return relerrors


def main():
    net = buildNet()
    cost = BCE()

    data = gpuarray.to_gpu(np.random.randn(1, 1, 6, 6).astype(np.float32))
    target = gpuarray.to_gpu(np.random.randint(0, 2, size=(1, )).astype(np.int32))

    gradientCheck(net, data, target, cost)


if __name__ == "__main__":
    main()
