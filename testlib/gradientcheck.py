"""Finite-difference gradient check.

Behavior parity target: /root/reference/TestLib/GradientCheck.py — central
differences on every parameter of a small conv/BN net against the framework's
analytic gradients.
"""

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
    """Return per-parameter relative central-difference errors."""
    def lossAt(var, flatIndex, value, keep):
        perturbed = keep.copy()
        perturbed.ravel()[flatIndex] = value
        var.data.set(perturbed)

        loss, _ = cost(mod(data), target)
        return loss

    # analytic gradients once
    error, grad = cost(mod(data), target)
    mod.backward(grad, updGrad=False)

    relerrors = []

    for var in mod.getVarTable():
        theta = var.data.get()
        analytic = -var.grad.get().ravel()

        for i, w in enumerate(theta.ravel()):
            numeric = (lossAt(var, i, w + h, theta) - lossAt(var, i, w - h, theta)) / (2.0 * h)
            var.data.set(theta)

            rel = abs((numeric - analytic[i]) / (analytic[i] + h))
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
