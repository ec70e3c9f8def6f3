"""VGG-16 train-step benchmark (reference: /root/reference/TestLib/OptimizeNet.py).

On TPU the "before" measurement is the eager per-op path and the headline
number is the fused single-executable step (FusedTrainer), which plays the
role of the reference's post-``optimizeForShape`` cuDNN-autotuned run.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.models.nets.vgg import loadVGG
from puzzlelib_tpu.optimizers import SGD
from puzzlelib_tpu.cost import CrossEntropy
from puzzlelib_tpu.handlers import Trainer
from puzzlelib_tpu.fused import FusedTrainer


def main(batchsize=16, looplength=100):
    net = loadVGG(None, "16")

    size = (batchsize, 3, 224, 224)

    batch = gpuarray.to_gpu(np.random.normal(size=size).astype(np.float32))
    labels = gpuarray.to_gpu(np.random.randint(low=0, high=1000, size=(batchsize, ), dtype=np.int32))

    optimizer = SGD()
    optimizer.setupOn(net, useGlobalState=True)

    cost = CrossEntropy(maxlabels=1000)

    print("Started benchmarking %s ..." % net.name)

    trainer = Trainer(net, cost, optimizer)
    gpuarray.timeKernel(
        trainer.train, args=(batch, labels), looplength=looplength,
        logname="Eager per-op %s" % net.name, normalize=True
    )

    fused = FusedTrainer(net, cost, optimizer)
    gpuarray.timeKernel(
        fused.train, args=(batch, labels), looplength=looplength,
        logname="Fused step %s" % net.name, normalize=True
    )


if __name__ == "__main__":
    main()
