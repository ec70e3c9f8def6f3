"""Restricted Boltzmann machine with CD/PCD training
(reference: /root/reference/Models/Misc/RBM.py)."""

import math

import numpy as np

from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.backend.kernels.elementwise import rbmKer
from puzzlelib_tpu.backend.kernels.matvec import addVecToMat

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import Module


class RBM(Module):
    def __init__(self, vsize, hsize, wscale=1.0, rng=None, useBias=True, name=None):
        super().__init__(name)

        from puzzlelib_tpu.rng import globalRng
        self.rng = globalRng if rng is None else rng

        W = np.random.normal(0.0, wscale / math.sqrt(vsize + hsize), (vsize, hsize)).astype(np.float32)

        self.W = None
        self.setVar("W", Variable(gpuarray.to_gpu(W)))

        self.useBias = useBias

        if useBias:
            self.b = None
            self.setVar("b", Variable(gpuarray.zeros((vsize, ), dtype=np.float32)))

            self.c = None
            self.setVar("c", Variable(gpuarray.zeros((hsize, ), dtype=np.float32)))

        self.particles = None

    def hiddenFromVisible(self, visible):
        hidden = Blas.mulMatrixOnMatrix(visible, self.W)

        if self.useBias:
            addVecToMat(self.c, hidden, axis=1, out=hidden)

        self.activateNeurons(hidden)
        return hidden

    def visibleFromHidden(self, hidden):
        visible = Blas.mulMatrixOnMatrix(hidden, self.W, transpB=True)

        if self.useBias:
            addVecToMat(self.b, visible, axis=1, out=visible)

        self.activateNeurons(visible)
        return visible

    def activateNeurons(self, neurons):
        rands = gpuarray.empty(neurons.shape, dtype=np.float32, allocator=memPool)
        self.rng.fillUniform(rands)

        rbmKer(neurons, neurons, rands)

    def updateData(self, data):
        raise RuntimeError("RBM does not support full module interface")

    def updateGrad(self, grad):
        raise RuntimeError("RBM does not support full module interface")

    def calcCDGrad(self, data):
        hidden = self.posPhaseGrad(data)
        self.negPhaseGrad(hidden)

    def calcPCDGrad(self, data):
        hidden = self.posPhaseGrad(data)

        if self.particles is None:
            self.particles = gpuarray.to_gpu(np.random.binomial(1, 0.5, size=hidden.shape).astype(np.float32))

        self.particles = self.negPhaseGrad(self.particles)

    def posPhaseGrad(self, data):
        hidden = self.hiddenFromVisible(data)

        Blas.mulMatrixOnMatrix(data, hidden, out=self.vars["W"].grad, transpA=True)

        if self.useBias:
            Blas.sumOnMatrix(data, out=self.vars["b"].grad)
            Blas.sumOnMatrix(hidden, out=self.vars["c"].grad)

        return hidden

    def negPhaseGrad(self, hidden):
        visible = self.visibleFromHidden(hidden)
        hidden = self.hiddenFromVisible(visible)

        Blas.mulMatrixOnMatrix(visible, hidden, out=self.vars["W"].grad, transpA=True, alpha=-1.0, beta=1.0)

        if self.useBias:
            Blas.sumOnMatrix(visible, out=self.vars["b"].grad, alpha=-1.0, beta=1.0)
            Blas.sumOnMatrix(hidden, out=self.vars["c"].grad, alpha=-1.0, beta=1.0)

        return hidden

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()
