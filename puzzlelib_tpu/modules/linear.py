"""Fully-connected layer (reference: /root/reference/Modules/Linear.py)."""

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.kernels import matvec as MatVec

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class Linear(Module):
    def __init__(self, insize, outsize, wscale=1.0, useBias=True, initscheme=None, name=None,
                 empty=False, transpose=False):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.transpose = transpose
        self.useBias = useBias

        self.W = None
        self.b = None

        if empty:
            return

        Wshape, bshape = ((outsize, insize), (insize, )) if transpose else ((insize, outsize), (outsize, ))
        W = self.createTensorWithScheme(initscheme, Wshape, wscale, factorShape=Wshape)

        self.setVar("W", Variable(gpuarray.empty(Wshape, dtype=self.calctype) if W is None else gpuarray.to_gpu(W)))

        if useBias:
            self.setVar("b", Variable(gpuarray.zeros(bshape, dtype=self.calctype)))

    def updateData(self, data):
        self.data = Blas.mulMatrixOnMatrix(data, self.W, transpB=self.transpose)

        if self.useBias:
            MatVec.addVecToMat(self.b, self.data, axis=1, out=self.data)

    def updateGrad(self, grad):
        self.grad = Blas.mulMatrixOnMatrix(grad, self.W, transpB=not self.transpose)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if not self.transpose:
            Blas.mulMatrixOnMatrix(self.inData, grad, out=self.vars["W"].grad, transpA=True,
                                   alpha=scale, beta=momentum)
        else:
            Blas.mulMatrixOnMatrix(grad, self.inData, out=self.vars["W"].grad, transpA=True,
                                   alpha=scale, beta=momentum)

        if self.useBias:
            Blas.sumOnMatrix(grad, out=self.vars["b"].grad, alpha=scale, beta=momentum)

    def optimizeForShape(self, shape, memlimit=None):
        """Per-shape measured GEMM dispatch: time the XLA dot against the best
        Pallas tiling for this layer's forward GEMM and memoize the winner
        (the cuDNN algo-search equivalent; cf. ConvND.optimizeForShape)."""
        import jax

        # the transposed fwd GEMM (data @ W.T) never routes to Pallas
        if jax.default_backend() == "cpu" or self.transpose:
            return

        from puzzlelib_tpu.ops.pallas import matmul as _plmm

        insize, outsize = self.W.shape

        if shape[1] != insize:
            return

        _plmm.tuneDispatch(shape[0], outsize, insize, dtype=self.calctype)

    def dataShapeFrom(self, shape):
        return (shape[0], self.W.shape[1]) if not self.transpose else (shape[0], self.W.shape[0])

    def checkDataShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Data must be 2d matrix")

        size = self.W.shape[0] if not self.transpose else self.W.shape[1]
        if shape[1] != size:
            raise ModuleError("Expected %d data dimensions, %d were given" % (size, shape[1]))

    def gradShapeFrom(self, shape):
        return (shape[0], self.W.shape[0]) if not self.transpose else (shape[0], self.W.shape[1])

    def checkGradShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Grad must be 2d matrix")

        size = self.W.shape[1] if not self.transpose else self.W.shape[0]
        if shape[1] != size:
            raise ModuleError("Expected %d grad dimensions, %d were given" % (size, shape[1]))

    def calcMode(self, T):
        dtypes = {dtype for dtype, _ in gpuarray.dtypesSupported()}
        if T not in dtypes:
            raise ModuleError("Unsupported dtype %s" % T)

        self.castVarsTo(T)
