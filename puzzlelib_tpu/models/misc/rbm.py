"""Restricted Boltzmann machine trained by contrastive divergence.

Matches the behavior of the reference RBM (/root/reference/Models/Misc/RBM.py):
``calcCDGrad`` / ``calcPCDGrad`` fill the variables' ``grad`` slots with the
*ascent* direction ``<v h>_data - <v h>_model`` so the usual optimizers drive
the log-likelihood up.  The implementation is TPU-native: the whole Gibbs
chain — both stochastic activations, all three positive/negative moment
differences — is one jitted program (the same fused-update idiom as
``optimizers/fused.py``), instead of the reference's per-op GEMM/kernel
dispatch sequence.  Randomness threads explicit ``jax.random`` keys drawn
from the module's RNG facade.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import Module


def _sampleUnits(key, preact):
    """Stochastic binary units: fire where sigmoid(preact) beats a uniform draw."""
    u = jax.random.uniform(key, preact.shape, dtype=preact.dtype)
    return (u < jax.nn.sigmoid(preact)).astype(preact.dtype)


@partial(jax.jit, static_argnames=("useBias", "persistent"))
def _gibbsGrads(W, b, c, data, fantasy, key, useBias, persistent):
    """One fused CD step: sample h|data, run the fantasy chain h->v->h, and
    emit the three moment differences.

    For plain CD the chain seeds from the data's own hidden sample (the
    ``fantasy`` operand is ignored); for PCD it seeds from the persistent
    particles.  Returns (gW, gb, gc, hData, hModel); gb/gc are scalar
    placeholders when useBias is False (ignored by the caller).
    """
    kData, kVis, kHid = jax.random.split(key, 3)

    biasV = b if useBias else 0.0
    biasH = c if useBias else 0.0

    hData = _sampleUnits(kData, data @ W + biasH)
    seed = fantasy if persistent else hData

    vModel = _sampleUnits(kVis, seed @ W.T + biasV)
    hModel = _sampleUnits(kHid, vModel @ W + biasH)

    gW = data.T @ hData - vModel.T @ hModel
    if useBias:
        gb = jnp.sum(data, axis=0) - jnp.sum(vModel, axis=0)
        gc = jnp.sum(hData, axis=0) - jnp.sum(hModel, axis=0)
    else:
        gb = gc = jnp.zeros((), data.dtype)

    return gW, gb, gc, hData, hModel


@partial(jax.jit, static_argnames=("transp", "useBias"))
def _sampleLayer(W, bias, batch, key, transp, useBias):
    pre = batch @ (W.T if transp else W)
    if useBias:
        pre = pre + bias
    return _sampleUnits(key, pre)


class RBM(Module):
    def __init__(self, vsize, hsize, wscale=1.0, rng=None, useBias=True, name=None):
        super().__init__(name)

        if rng is None:
            from puzzlelib_tpu.rng import globalRng
            rng = globalRng
        self.rng = rng

        scale = wscale / math.sqrt(vsize + hsize)
        W = np.random.normal(0.0, scale, (vsize, hsize)).astype(np.float32)
        self.W = None
        self.setVar("W", Variable(gpuarray.to_gpu(W)))

        self.useBias = useBias
        if useBias:
            self.b, self.c = None, None
            self.setVar("b", Variable(gpuarray.zeros((vsize, ), dtype=np.float32)))
            self.setVar("c", Variable(gpuarray.zeros((hsize, ), dtype=np.float32)))

        self.particles = None

    # -- sampling -----------------------------------------------------------

    def _biases(self):
        if self.useBias:
            return self.b.jax, self.c.jax
        zero = jnp.zeros((), jnp.float32)
        return zero, zero

    def hiddenFromVisible(self, visible):
        _, c = self._biases()
        h = _sampleLayer(self.W.jax, c, visible.jax, self.rng.nextKey(), False, self.useBias)
        return GPUArray(h)

    def visibleFromHidden(self, hidden):
        b, _ = self._biases()
        v = _sampleLayer(self.W.jax, b, hidden.jax, self.rng.nextKey(), True, self.useBias)
        return GPUArray(v)

    # -- training -----------------------------------------------------------

    def _accumulate(self, data, fantasy, persistent):
        b, c = self._biases()
        gW, gb, gc, hData, hModel = _gibbsGrads(
            self.W.jax, b, c, data.jax, fantasy, self.rng.nextKey(), self.useBias, persistent
        )

        self.vars["W"].grad._write(gW)
        if self.useBias:
            self.vars["b"].grad._write(gb)
            self.vars["c"].grad._write(gc)

        return hData, hModel

    def calcCDGrad(self, data):
        # CD-1: the fantasy chain starts from the data's own hidden sample
        self._accumulate(data, data.jax, persistent=False)

    def calcPCDGrad(self, data):
        # persistent CD: the fantasy chain survives across updates
        if self.particles is None:
            hsize = self.W.shape[1]
            init = np.random.binomial(1, 0.5, size=(data.shape[0], hsize))
            self.particles = gpuarray.to_gpu(init.astype(np.float32))

        _, hModel = self._accumulate(data, self.particles.jax, persistent=True)
        self.particles = GPUArray(hModel)

    # -- module protocol (the reference RBM opts out of it too) -------------

    def updateData(self, data):
        raise RuntimeError("RBM does not support full module interface")

    def updateGrad(self, grad):
        raise RuntimeError("RBM does not support full module interface")

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()
