"""N-d convolution module.

API parity target: /root/reference/Modules/ConvND.py (grouped conv, bias,
cuDNN-style algo fields).  The algo enums are kept for API/blueprint parity;
on TPU ``optimizeForShape`` drives the Pallas tile autotuner / jit warmup via
``convNdbenchmark`` instead of picking cuDNN algorithms.
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

        self.stride, self.pad = self.repeat(stride, nd), self.repeat(pad, nd)
        self.dilation = self.repeat(dilation, nd)
        self.useBias, self.groups = useBias, groups

        # cuDNN-parity algo slots; "auto" lets the backend (XLA/Pallas) choose
        self.fwdAlgo = ConvFwdAlgo.auto
        self.bwdFilterAlgo = ConvBwdFilterAlgo.auto
        self.bwdDataAlgo = ConvBwdDataAlgo.auto

        if inmaps % groups or outmaps % groups:
            raise ModuleError(
                "Number of input and output maps must be divisible by number of groups "
                "(%d inmaps, %d outmaps, %d groups)" % (inmaps, outmaps, groups)
            )

        self.W, self.b = None, None

        if not empty:
            self._initParams(outmaps, inmaps // groups, self.repeat(size, nd), initscheme, wscale, nd)

    def _initParams(self, outmaps, inmapsPerGroup, window, initscheme, wscale, nd):
        Wshape = (outmaps, inmapsPerGroup) + window
        W = self.createTensorWithScheme(initscheme, Wshape, wscale)

        tensor = gpuarray.empty(Wshape, dtype=self.calctype) if W is None else gpuarray.to_gpu(W)
        self.setVar("W", Variable(tensor))

        if self.useBias:
            self.setVar("b", Variable(gpuarray.zeros((1, outmaps) + (1, ) * nd, dtype=self.calctype)))

    def optimizeForShape(self, shape, memlimit=None):
        # pre-times compiled kernels / tunes Pallas tiles for this shape
        convNdbenchmark(shape, self.W.shape, self.stride, self.pad, self.dilation, self.groups, transpose=False)

    def installDefaultAlgos(self):
        pass

    def updateData(self, data):
        self.data = convNd(data, self.W, self.b, stride=self.stride, pad=self.pad,
                           dilation=self.dilation, groups=self.groups, algo=self.fwdAlgo)

    def updateGrad(self, grad):
        self.grad = convNdBackwardData(grad, self.W, data=self.inData, stride=self.stride, pad=self.pad,
                                       dilation=self.dilation, groups=self.groups, algo=self.bwdDataAlgo)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        bgrad = self.vars["b"].grad if self.b is not None else None
        convNdBackwardParams(self.inData, grad, self.W, self.b, stride=self.stride, pad=self.pad,
                             dilation=self.dilation, groups=self.groups, wgrad=self.vars["W"].grad,
                             bgrad=bgrad, scale=scale, momentum=momentum, algo=self.bwdFilterAlgo)

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()

    def calcMode(self, T):
        self.requireSupportedDtype(T)
        self.castVarsTo(T)
