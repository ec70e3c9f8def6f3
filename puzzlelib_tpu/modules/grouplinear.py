"""Grouped linear layer: independent per-group affine maps over a 3d tensor.

Behavioral contract follows the reference GroupLinear
(/root/reference/Modules/GroupLinear.py): the group axis can sit before or
after the batch axis (``batchDim``), the weight tensor can hold one matrix per
group or a single shared matrix (``wmode``), and the incoming data can carry a
real group axis or a broadcastable singleton one (``inmode``).  Compute runs
through the repo's batched-GEMM surface (``Blas.mulTensorBatch``), which jits
to a single MXU einsum per call.
"""

from enum import Enum

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.kernels.matvec import addVecToMat, addVecToMatBatch

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class GroupMode(str, Enum):
    full = "full"
    one = "one"


# batchDim -> (mulTensorBatch layout tag, index of the group axis)
_LAYOUTS = {0: ("bgp", 1), 1: ("gbp", 0)}


class GroupLinear(Module):
    def __init__(self, groups, insize, outsize, wscale=1.0, useW=True, useBias=True, initscheme=None,
                 inmode="full", wmode="full", batchDim=0, name=None, empty=False, transpW=False):
        super().__init__(name)
        self.registerBlueprint(locals())

        if not useW and not useBias:
            raise ModuleError("Not using W and bias is not supported")

        try:
            self.format, self.groupDim = _LAYOUTS[batchDim]
        except KeyError:
            raise ModuleError("Unsupported batch dimension") from None

        self.useW, self.useBias, self.transpW = useW, useBias, transpW
        self.inmode, self.wmode = GroupMode(inmode), GroupMode(wmode)
        self.groups = groups if groups is not None else 1

        self.W = None
        self.b = None

        if empty:
            return

        wgroups = self.groups if self.wmode == GroupMode.full else 1

        if useW:
            # stored as (g, rows, cols); transpW swaps which side is "in"
            rows, cols = (outsize, insize) if transpW else (insize, outsize)
            init = self.createTensorWithScheme(initscheme, (wgroups, rows, cols), wscale,
                                               factorShape=(rows, cols))
            if init is None:
                W = gpuarray.empty((wgroups, rows, cols), dtype=np.float32)
            else:
                W = gpuarray.to_gpu(init)
            self.setVar("W", Variable(W))

        if useBias:
            bsize = outsize if useW else insize
            self.setVar("b", Variable(gpuarray.zeros((wgroups, bsize), dtype=np.float32)))

    # -- sizes along the feature axis ---------------------------------------

    def _wFeatures(self):
        """(input features, output features) as the stored W defines them."""
        g, rows, cols = self.W.shape
        return (cols, rows) if self.transpW else (rows, cols)

    # -- forward / backward -------------------------------------------------

    def updateData(self, data):
        if self.useW:
            self.data = Blas.mulTensorBatch(
                data, self.W, formatA=self.format, formatB="gbp",
                transpB=self.transpW, formatOut=self.format
            )
        else:
            self.data = gpuarray.copy(None, data)

        if not self.useBias:
            return

        if self.groupDim == 1:
            flat = self.data.reshape(self.data.shape[0], -1)
            addVecToMat(self.b.ravel(), flat, axis=1, out=flat)
        else:
            addVecToMatBatch(self.b, self.data, axis=1, out=self.data)

    def updateGrad(self, grad):
        if not self.useW:
            self.grad = grad
            return

        broadcastIn = self.inmode != GroupMode.full
        self.grad = Blas.mulTensorBatch(
            grad, self.W, formatA=self.format, formatB="gbp",
            transpB=not self.transpW, formatOut="gbp" if broadcastIn else self.format
        )

        if broadcastIn:
            # data had a singleton group axis: fold the per-group grads back down
            batch, insize = grad.shape[0], self.W.shape[1]
            folded = Blas.sumOnMatrix(self.grad.reshape(self.groups, batch * insize))
            self.grad = folded.reshape(batch, 1, insize)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        shared = self.wmode != GroupMode.full

        if self.useW:
            A, B = (grad, self.inData) if self.transpW else (self.inData, grad)

            if shared:
                perGroup = Blas.mulTensorBatch(
                    A, B, transpA=True, formatA=self.format, formatB=self.format,
                    formatOut="gbp", alpha=scale, beta=momentum
                )
                Blas.sumOnMatrix(perGroup.reshape(perGroup.shape[0], -1),
                                 out=self.vars["W"].grad.ravel())
            else:
                Blas.mulTensorBatch(
                    A, B, out=self.vars["W"].grad, transpA=True, formatA=self.format,
                    formatB=self.format, formatOut="gbp", alpha=scale, beta=momentum
                )

        if self.useBias:
            if shared:
                rows = grad.shape[0] * grad.shape[1]
                Blas.sumOnMatrix(grad.reshape(rows, grad.shape[2]), out=self.vars["b"].grad[0])
            else:
                Blas.sumOnTensorGroup(grad, out=self.vars["b"].grad, formatT=self.format)

    # -- shape protocol -----------------------------------------------------

    def _withGroupAxis(self, batch, g):
        """Assemble the leading (batch, group) axes in this layer's layout."""
        return (batch, g) if self.groupDim == 1 else (g, batch)

    def dataShapeFrom(self, shape):
        batch = shape[1 - self.groupDim]
        g = shape[self.groupDim] if self.inmode == GroupMode.full else self.groups
        feat = self._wFeatures()[1] if self.useW else shape[2]
        return self._withGroupAxis(batch, g) + (feat, )

    def gradShapeFrom(self, shape):
        batch = shape[1 - self.groupDim]
        g = self.groups if self.inmode == GroupMode.full else 1
        feat = self._wFeatures()[0] if self.useW else shape[2]
        return self._withGroupAxis(batch, g) + (feat, )

    def checkDataShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Data must be 3d tensor")

        g = shape[self.groupDim]
        if self.inmode == GroupMode.one:
            if shape[1] != 1:
                raise ModuleError("Expected 1 group in data, %d were given" % shape[1])
        elif self.wmode != GroupMode.one and g != self.groups:
            raise ModuleError("Expected %d groups in data, %d were given" % (self.groups, g))

        if self.useW and shape[2] != self._wFeatures()[0]:
            raise ModuleError(
                "Expected %d data dimensions, %d were given" % (self._wFeatures()[0], shape[2])
            )

    def checkGradShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Grad must be 3d tensor")

        g = shape[self.groupDim]
        if self.wmode == GroupMode.full and g != self.groups:
            raise ModuleError("Expected %d groups in grad, %d were given" % (self.groups, g))

        if self.useW and shape[2] != self._wFeatures()[1]:
            raise ModuleError(
                "Expected %d grad dimensions, %d were given" % (self._wFeatures()[1], shape[2])
            )
