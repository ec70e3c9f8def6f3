"""N-d transposed convolution module.

API parity target: /root/reference/Modules/DeconvND.py (grouped deconv with
``postpad`` output trimming, (inmaps, outmaps/g, *k) weight layout, cuDNN-style
algo fields). Forward is the backend's input-dilated conv; ``optimizeForShape``
drives the measured algo choice on the transposed signature.
"""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.dnn import ConvFwdAlgo, ConvBwdDataAlgo, ConvBwdFilterAlgo
from puzzlelib_tpu.backend.dnn import convNdbenchmark, deconvNd, deconvNdBackwardData, deconvNdBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class DeconvND(Module):
    def __init__(self, nd, inmaps, outmaps, size, stride=1, pad=0, dilation=1, postpad=0, wscale=1.0, useBias=True,
                 name=None, initscheme=None, empty=False, groups=1):
        super().__init__(name)

        self.stride, self.pad = self.repeat(stride, nd), self.repeat(pad, nd)
        self.dilation, self.postpad = self.repeat(dilation, nd), self.repeat(postpad, nd)
        self.useBias, self.groups = useBias, groups

        if any(pp >= max(s, d) for pp, s, d in zip(self.postpad, self.stride, self.dilation)):
            raise ModuleError("Postpad must be smaller than stride and dilation")

        if inmaps % groups or outmaps % groups:
            raise ModuleError(
                "Number of input and output maps must be divisible by number of groups "
                "(%d inmaps, %d outmaps, %d groups)" % (inmaps, outmaps, groups)
            )

        # cuDNN-parity algo slots; "auto" lets the backend (XLA/Pallas) choose
        self.fwdAlgo = ConvFwdAlgo.auto
        self.bwdFilterAlgo = ConvBwdFilterAlgo.auto
        self.bwdDataAlgo = ConvBwdDataAlgo.auto

        self.W, self.b = None, None

        if not empty:
            self._initParams(inmaps, outmaps // groups, self.repeat(size, nd), initscheme, wscale, nd)

    def _initParams(self, inmaps, outmapsPerGroup, window, initscheme, wscale, nd):
        # deconv weights transpose the io roles: (inmaps, outmaps/g, *window)
        Wshape = (inmaps, outmapsPerGroup) + window
        W = self.createTensorWithScheme(initscheme, Wshape, wscale, factorTranspose=True)

        tensor = gpuarray.empty(Wshape, dtype=self.calctype) if W is None else gpuarray.to_gpu(W)
        self.setVar("W", Variable(tensor))

        if self.useBias:
            self.setVar("b", Variable(gpuarray.zeros((1, outmapsPerGroup) + (1, ) * nd, dtype=self.calctype)))

    def optimizeForShape(self, shape, memlimit=None):
        outshape = self.dataShapeFrom(shape)
        convNdbenchmark(outshape, self.W.shape, self.stride, self.pad, self.dilation, self.groups, transpose=True)

    def updateData(self, data):
        self.data = deconvNd(data, self.W, self.b, stride=self.stride, pad=self.pad, dilation=self.dilation,
                             postpad=self.postpad, groups=self.groups, algo=self.bwdDataAlgo)

    def updateGrad(self, grad):
        self.grad = deconvNdBackwardData(grad, self.W, data=self.inData, stride=self.stride, pad=self.pad,
                                         dilation=self.dilation, groups=self.groups, algo=self.fwdAlgo)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        bgrad = self.vars["b"].grad if self.b is not None else None
        deconvNdBackwardParams(self.inData, grad, self.W, self.b, stride=self.stride, pad=self.pad,
                               dilation=self.dilation, groups=self.groups, wgrad=self.vars["W"].grad,
                               bgrad=bgrad, scale=scale, momentum=momentum, algo=self.bwdFilterAlgo)

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()

    def calcMode(self, T):
        self.requireSupportedDtype(T)
        self.castVarsTo(T)
