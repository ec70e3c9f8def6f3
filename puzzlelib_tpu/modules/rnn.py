"""Recurrent module: relu/tanh/LSTM/GRU, uni/bi, multi-layer
(reference: /root/reference/Modules/RNN.py; engine: puzzlelib_tpu/backend/rnn.py).
"""

from enum import Enum

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import split, memoryPool as memPool
from puzzlelib_tpu.backend.dnn import RNNMode as BackendRNNMode, DirectionMode as BackendDirectionMode, createRnn
from puzzlelib_tpu.backend.dnn import updateRnnParams, acquireRnnParams, forwardRnn, backwardDataRnn, backwardParamsRnn

from puzzlelib_tpu.modules.module import ModuleError, Module
from puzzlelib_tpu.variable import Variable


class RNNMode(str, Enum):
    relu = "relu"
    tanh = "tanh"
    lstm = "lstm"
    gru = "gru"


class DirectionMode(str, Enum):
    uni = "uni"
    bi = "bi"


class WeightModifier(str, Enum):
    orthogonal = "orthogonal"
    identity = "identity"


class RNN(Module):
    def __init__(self, insize, hsize, layers=1, mode="relu", direction="uni", dropout=0.0, getSequences=False,
                 initscheme=None, modifier="orthogonal", wscale=1.0, hintBatchSize=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.gradUsesOutData = True

        self.insize = insize
        self.hsize = hsize
        self.layers = layers
        self.mode = RNNMode(mode)
        self.direction = DirectionMode(direction)
        self.dropout = dropout
        self.getSequences = getSequences
        self.hintBatchSize = hintBatchSize

        mode = BackendRNNMode(self.mode.value)
        direction = BackendDirectionMode(self.direction.value)

        self.descRnn, W, params = createRnn(
            insize, hsize, layers, mode, direction, dropout, seed=int(np.random.randint(1 << 31)),
            batchsize=hintBatchSize
        )

        self.W = None
        self.setVar("W", Variable(W))
        self.params = params

        self.initParams(initscheme, wscale, modifier)
        self.reserve, self.fulldata, self.dw = None, None, None

    def initParams(self, initscheme, wscale, modifier):
        modifier = WeightModifier(modifier)

        layers = (self.params[key] for key in sorted(self.params.keys()))

        for layer in layers:
            for paramName, param in sorted(layer.items()):
                if paramName.startswith("b"):
                    param.fill(0.0)

                else:
                    if paramName.startswith("r"):
                        if modifier == WeightModifier.orthogonal:
                            a = np.random.normal(0.0, 1.0, param.shape)
                            u, _, v = np.linalg.svd(a, full_matrices=False)
                            W = u if u.shape == param.shape else v
                            W = W[:param.shape[0], :param.shape[1]].astype(np.float32)

                        elif modifier == WeightModifier.identity:
                            W = np.identity(param.shape[0], dtype=np.float32)

                        else:
                            raise NotImplementedError(modifier)
                    else:
                        W = self.createTensorWithScheme(initscheme, param.shape, wscale)
                        if W is None:
                            continue

                    param.set(W)

        self.updateDeviceMemory()

    def updateDeviceMemory(self):
        updateRnnParams(self.descRnn, self.W, self.params)

    def setVar(self, name, var):
        if name == "W" and hasattr(self, "params"):
            _, self.params = acquireRnnParams(self.descRnn, var.data)

        super().setVar(name, var)

    def updateData(self, data):
        if self.train:
            self.fulldata, self.reserve = forwardRnn(data, self.W, self.descRnn)
        else:
            self.fulldata = forwardRnn(data, self.W, self.descRnn, test=True)

        if self.direction == DirectionMode.uni:
            self.data = self.fulldata if self.getSequences else self.fulldata[-1]
        else:
            if self.getSequences:
                self.data = self.fulldata
            else:
                fwddata, bwddata = self.fulldata[-1], self.fulldata[0]
                sections = (self.hsize, self.hsize)
                self.data = [split(fwddata, sections, axis=1)[0], split(bwddata, sections, axis=1)[1]]

    def _buildFullGrad(self, grad):
        if self.getSequences:
            return grad

        seqlen = self.fulldata.shape[0]

        if self.direction == DirectionMode.uni:
            fullgrad = gpuarray.zeros((seqlen, ) + grad.shape, dtype=grad.dtype, allocator=memPool)
            fullgrad[seqlen - 1] = grad

        else:
            fwdgrad, bwdgrad = grad
            batchsize, hsize = fwdgrad.shape[0], 2 * self.hsize

            fullgrad = gpuarray.zeros((seqlen, batchsize, hsize), dtype=fwdgrad.dtype, allocator=memPool)
            fullgrad[0, :, bwdgrad.shape[1]:] = bwdgrad
            fullgrad[-1, :, :fwdgrad.shape[1]] = fwdgrad

        return fullgrad

    def updateGrad(self, grad):
        fullgrad = self._buildFullGrad(grad)
        self.grad, self.reserve = backwardDataRnn(fullgrad, self.fulldata, self.W, self.reserve, self.descRnn)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        # backwardParams recomputes via VJP and needs the output grad even when
        # updateGrad was skipped (updGrad=False on the net's first module)
        self.descRnn._lastGrad = self._buildFullGrad(grad).jax

        self.dw = backwardParamsRnn(self.inData, self.fulldata, self.W, self.reserve, self.descRnn)
        Blas.addVectorToVector(self.dw, self.getVar("W").grad, out=self.getVar("W").grad, alpha=scale, beta=momentum)

    def checkDataShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Data must be 3d tensor")

        if shape[2] != self.insize:
            raise ModuleError("Data must have data size = %s (was given %s)" % (self.insize, shape[2]))

    def checkGradShape(self, shape):
        if self.getSequences:
            if len(shape) != 3:
                raise ModuleError("Grad must be 3d tensor")
        else:
            if self.direction == DirectionMode.uni:
                if len(shape) != 2:
                    raise ModuleError("Grad must be 2d matrix")

                if shape[-1] != self.hsize:
                    raise ModuleError("Grad must have data size = %s (was given %s)" % (self.hsize, shape[-1]))
            else:
                fwdshape, bwdshape = shape

                if len(fwdshape) != 2 or len(bwdshape) != 2:
                    raise ModuleError("Grads must be 2d matrices")

                if fwdshape[-1] != self.hsize or bwdshape[-1] != self.hsize:
                    raise ModuleError("Grads must have data size = %s (was given %s and %s)" %
                                      (self.hsize, fwdshape[1], bwdshape[1]))

    def dataShapeFrom(self, shape):
        hsize = self.hsize if self.direction == DirectionMode.uni else 2 * self.hsize

        if self.getSequences:
            return shape[:2] + (hsize, )
        else:
            return (shape[1], hsize) if self.direction == DirectionMode.uni \
                else [(shape[1], self.hsize), (shape[1], self.hsize)]

    def gradShapeFrom(self, shape):
        seqlen = self.inData.shape[0]

        if self.getSequences:
            batchsize = shape[1]
        else:
            batchsize = shape[0] if self.direction == DirectionMode.uni else shape[0][0]

        return seqlen, batchsize, self.insize

    def reset(self):
        super().reset()
        self.reserve = None
        self.fulldata = None
        self.dw = None
