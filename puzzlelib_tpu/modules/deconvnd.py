"""N-d transposed convolution (reference: /root/reference/Modules/DeconvND.py)."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.dnn import ConvFwdAlgo, ConvBwdDataAlgo, ConvBwdFilterAlgo
from puzzlelib_tpu.backend.dnn import convNdbenchmark, deconvNd, deconvNdBackwardData, deconvNdBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class DeconvND(Module):
    def __init__(self, nd, inmaps, outmaps, size, stride=1, pad=0, dilation=1, postpad=0, wscale=1.0, useBias=True,
                 name=None, initscheme=None, empty=False, groups=1):
        super().__init__(name)

        self.stride = self.repeat(stride, nd)
        self.pad = self.repeat(pad, nd)
        self.dilation = self.repeat(dilation, nd)
        self.postpad = self.repeat(postpad, nd)

        if any(p >= max(s, d) for p, s, d in zip(self.postpad, self.stride, self.dilation)):
            raise ModuleError("Postpad must be smaller than stride and dilation")

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

        outmaps //= groups

        self.W = None
        self.b = None

        if empty:
            return

        Wshape = (inmaps, outmaps, *self.repeat(size, nd))
        W = self.createTensorWithScheme(initscheme, Wshape, wscale, factorTranspose=True)

        self.setVar("W", Variable(gpuarray.empty(Wshape, dtype=self.calctype) if W is None else gpuarray.to_gpu(W)))

        if useBias:
            bshape = (1, outmaps) + self.repeat(1, nd)
            self.setVar("b", Variable(gpuarray.zeros(bshape, dtype=self.calctype)))

    def optimizeForShape(self, shape, memlimit=None):
        shape = self.dataShapeFrom(shape)
        convNdbenchmark(shape, self.W.shape, self.stride, self.pad, self.dilation, self.groups, transpose=True)

    def updateData(self, data):
        self.data = deconvNd(
            data, self.W, self.b, stride=self.stride, pad=self.pad, dilation=self.dilation, postpad=self.postpad,
            groups=self.groups, algo=self.bwdDataAlgo
        )

    def updateGrad(self, grad):
        self.grad = deconvNdBackwardData(
            grad, self.W, data=self.inData, stride=self.stride, pad=self.pad, dilation=self.dilation,
            groups=self.groups, algo=self.fwdAlgo
        )

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        deconvNdBackwardParams(
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
