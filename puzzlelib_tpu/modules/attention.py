"""Multi-head self-attention module.

Not present in the reference (CNN/RNN era) — added for the transformer stack,
with the framework's eager protocol (explicit updateData/updateGrad/
accGradParams over pure jitted ops in puzzlelib_tpu/ops/attention.py).
``Config.attentionAlgo = "flash"`` (or ``attnAlgo="flash"``) routes the
inference forward through the Pallas online-softmax kernel.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module
from puzzlelib_tpu.ops import attention as attnops


class MultiHeadAttention(Module):
    def __init__(self, embsize, nheads, causal=False, useBias=True, wscale=1.0,
                 initscheme=None, attnAlgo=None, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        if embsize % nheads != 0:
            raise ModuleError("Embedding size %d not divisible by %d heads" % (embsize, nheads))

        self.embsize = embsize
        self.nheads = nheads
        self.causal = causal
        self.useBias = useBias
        from puzzlelib_tpu import config as Config
        self.attnAlgo = attnAlgo if attnAlgo is not None else Config.attentionAlgo

        shape = (embsize, embsize)
        for wname in ("Wq", "Wk", "Wv", "Wo"):
            W = self.createTensorWithScheme(initscheme, shape, wscale, factorShape=shape)
            self.setVar(wname, Variable(
                gpuarray.empty(shape, dtype=self.calctype) if W is None else gpuarray.to_gpu(W)
            ))

        if useBias:
            for bname in ("bq", "bk", "bv", "bo"):
                self.setVar(bname, Variable(gpuarray.zeros((embsize, ), dtype=self.calctype)))

    def _weights(self):
        ws = [self.vars[n].data.jax for n in ("Wq", "Wk", "Wv", "Wo")]
        bs = [self.vars[n].data.jax for n in ("bq", "bk", "bv", "bo")] if self.useBias \
            else [None] * 4
        return ws, bs

    def _algo(self, shape):
        """Concrete kernel for this input signature.

        "auto" (the default) consults the measured per-signature dispatch
        table (populated by ``optimizeForShape``) with the long-sequence
        structural prior as fallback — the attention arm of the conv/GEMM
        measured-dispatch family.  The flash kernel needs a real TPU to
        compile (CPU supports interpret mode only); training differentiates
        through its custom VJP (blockwise flash backward)."""
        algo = self.attnAlgo

        batch, seq = shape[0], shape[1]
        hdim = self.embsize // self.nheads

        if algo == "auto":
            return attnops.resolveAlgo(batch, self.nheads, seq, hdim,
                                       self.causal, self.calctype)

        if algo == "flash":
            import jax
            if jax.devices()[0].platform == "cpu":
                algo = "xla"
        return algo

    def optimizeForShape(self, shape, memlimit=None):
        # race flash vs XLA for this signature and persist the winner
        # (Module.optimizeForShape = the cuDNN algo-search hook)
        attnops.measureAttnChoice(shape[0], self.nheads, shape[1],
                                  self.embsize // self.nheads,
                                  self.causal, self.calctype)

    def updateData(self, data):
        (wq, wk, wv, wo), (bq, bk, bv, bo) = self._weights()

        self.data = gpuarray.GPUArray(attnops.mhaForward(
            data.jax, wq, wk, wv, wo, bq, bk, bv, bo,
            nheads=self.nheads, causal=self.causal, algo=self._algo(data.shape)
        ))
        # any cached backward belongs to the previous forward
        self._vjpCache, self._vjpGradArr = None, None

    def _vjp(self, grad):
        # cache keyed on the grad array object itself (held strongly, so the
        # identity cannot be recycled): updateGrad and accGradParams share one
        # backward per (forward, grad) pair, while a second backward with a
        # different grad recomputes instead of returning stale values
        if getattr(self, "_vjpCache", None) is None or self._vjpGradArr is not grad.jax:
            (wq, wk, wv, wo), (bq, bk, bv, bo) = self._weights()
            self._vjpCache = attnops.mhaBackward(
                self.inData.jax, wq, wk, wv, wo, bq, bk, bv, bo, grad.jax,
                nheads=self.nheads, causal=self.causal, algo=self._algo(self.inData.shape)
            )
            self._vjpGradArr = grad.jax

        return self._vjpCache

    def updateGrad(self, grad):
        self.grad = gpuarray.GPUArray(self._vjp(grad)[0])

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        grads = self._vjp(grad)[1:]

        names = ("Wq", "Wk", "Wv", "Wo") + (("bq", "bk", "bv", "bo") if self.useBias else ())
        for name, g in zip(names, grads):
            var = self.vars[name]
            var.grad._write(momentum * var.grad.jax + scale * g)

    def reset(self):
        super().reset()
        self._vjpCache = None

    def checkDataShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Data must be 3d (batch, seq, emb)")
        if shape[2] != self.embsize:
            raise ModuleError("Expected embedding size %d, got %d" % (self.embsize, shape[2]))

    def checkGradShape(self, shape):
        self.checkDataShape(shape)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        dtypes = {dtype for dtype, _ in gpuarray.dtypesSupported()}
        if T not in dtypes:
            raise ModuleError("Unsupported dtype %s" % T)

        self.castVarsTo(T)
        self.calctype = T
