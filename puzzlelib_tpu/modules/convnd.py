"""N-d convolution module (reference: /root/reference/Modules/ConvND.py).

Algo fields are kept for API/blueprint parity; XLA owns algorithm selection, so
``optimizeForShape`` pre-times the compiled kernels (warming the jit cache)
instead of picking cuDNN algos.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.dnn import ConvFwdAlgo, ConvBwdDataAlgo, ConvBwdFilterAlgo
from puzzlelib_tpu.backend.dnn import convNdbenchmark, convNd, convNdBackwardData, convNdBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class ConvND(Module):
    def __init__(self, nd, inmaps, outmaps, size, stride=1, pad=0, dilation=1, wscale=1.0, useBias=True,
                 name=None, initscheme=None, empty=False, groups=1):
        super().__init__(name)

        self.stride = self.repeat(stride, nd)
        self.pad = self.repeat(pad, nd)
        self.dilation = self.repeat(dilation, nd)

        self.useBias = useBias
        self.groups = groups

        self.fwdAlgo = ConvFwdAlgo.auto
        self.bwdFilterAlgo = ConvBwdFilterAlgo.auto
        self.bwdDataAlgo = ConvBwdDataAlgo.auto

        if inmaps % groups != 0 or outmaps % groups != 0:
            raise ModuleError(
                "Number of input and output maps must be divisible by number of groups "
                "(%d inmaps, %d outmaps, %d groups)" % (inmaps, outmaps, groups)
            )

        inmaps //= groups

        self.W = None
        self.b = None

        if empty:
            return

        Wshape = (outmaps, inmaps, *self.repeat(size, nd))
        W = self.createTensorWithScheme(initscheme, Wshape, wscale)

        self.setVar("W", Variable(gpuarray.empty(Wshape, dtype=self.calctype) if W is None else gpuarray.to_gpu(W)))

        if useBias:
            bshape = (1, outmaps) + self.repeat(1, nd)
            self.setVar("b", Variable(gpuarray.zeros(bshape, dtype=self.calctype)))

    def optimizeForShape(self, shape, memlimit=None):
        convNdbenchmark(shape, self.W.shape, self.stride, self.pad, self.dilation, self.groups, transpose=False)

    def installDefaultAlgos(self):
        pass

    def updateData(self, data):
        self.data = convNd(
            data, self.W, self.b, stride=self.stride, pad=self.pad, dilation=self.dilation,
            groups=self.groups, algo=self.fwdAlgo
        )

    def updateGrad(self, grad):
        self.grad = convNdBackwardData(
            grad, self.W, data=self.inData, stride=self.stride, pad=self.pad, dilation=self.dilation,
            groups=self.groups, algo=self.bwdDataAlgo
        )

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        convNdBackwardParams(
            self.inData, grad, self.W, self.b, stride=self.stride, pad=self.pad, dilation=self.dilation,
            groups=self.groups, wgrad=self.vars["W"].grad, bgrad=self.vars["b"].grad if self.b is not None else None,
            scale=scale, momentum=momentum, algo=self.bwdFilterAlgo
        )

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()

    def calcMode(self, T):
        dtypes = {dtype for dtype, _ in gpuarray.dtypesSupported()}
        if T not in dtypes:
            raise ModuleError("Unsupported dtype %s" % T)

        self.castVarsTo(T)
