"""Local contrast normalization (reference: /root/reference/Modules/LCN.py).

Composite of mean-pooling + divisive normalization.  Unlike the reference
(which chains two backward kernels by hand), the full composite
x -> divnorm(x, avgpool(x)) is differentiated as one VJP, which both matches
the analytic gradient and lets XLA fuse the chain.
"""

from functools import partial

import jax

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.dnn import PoolMode
from puzzlelib_tpu.ops import pool as _pool
from puzzlelib_tpu.ops import norm as _norm

from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.modules.lrn import LRN


@partial(jax.jit, static_argnames=("N", "mode"))
def _lcnForward(x, N, alpha, beta, K, mode):
    size, pad = (N, N), (N // 2, N // 2)
    means = _pool._poolCore(x, size, (1, 1), pad, mode)
    return _norm._divNormCore(x, means, N, alpha, beta, K)


@partial(jax.jit, static_argnames=("N", "mode"))
def _lcnBackward(x, grad, N, alpha, beta, K, mode):
    _, vjp = jax.vjp(lambda xx: _lcnForward.__wrapped__(xx, N, alpha, beta, K, mode), x)
    return vjp(grad)[0]


class LCN(LRN):
    def __init__(self, N=5, alpha=1e-4, beta=0.75, K=2.0, includePad=True, name=None):
        super().__init__(N, alpha, beta, K, name)
        self.registerBlueprint(locals())

        if N % 2 != 1 or N == 1:
            raise ModuleError("LCN size must be odd and > 1")

        self.includePad = includePad
        self.mode = PoolMode.avgWithPad if includePad else PoolMode.avgNoPad

    def updateData(self, data):
        self.data = gpuarray.GPUArray(
            _lcnForward(data.jax, self.N, self.alpha, self.beta, self.K, self.mode.value)
        )

    def updateGrad(self, grad):
        self.grad = gpuarray.GPUArray(
            _lcnBackward(self.inData.jax, grad.jax, self.N, self.alpha, self.beta, self.K, self.mode.value)
        )
