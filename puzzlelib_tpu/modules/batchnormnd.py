"""N-dimensional batch normalization.

API parity target: /root/reference/Modules/BatchNormND.py (cuDNN-spatial-mode
semantics: per-map statistics over batch and spatial dims, running mean/var
blended with a decaying factor).  Under a fused trace the prop counter is a
traced step value from ``fusedctx`` so the compiled step stays step-agnostic.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.dnn import batchNormNd, batchNormNdBackward

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class BatchNormND(Module):
    def __init__(self, nd, maps, epsilon=1e-5, initFactor=1.0, minFactor=0.1, sscale=0.01, affine=True, name=None,
                 empty=False, inplace=False):
        super().__init__(name)

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        self.maps, self.epsilon = maps, epsilon
        self.initFactor, self.minFactor = initFactor, minFactor
        self.numOfProps = 0
        self.affine = affine

        self.scale = self.bias = self.mean = self.var = None
        self.savemean = self.saveinvvar = None
        self.scalegrad = self.biasgrad = None

        if not empty:
            self._initState((1, maps) + self.repeat(1, nd), sscale)

    def _initState(self, shape, sscale):
        # scale jittered around 1 when affine (so the map is learnable from
        # the start), exactly 1 otherwise; running stats start at (0, 1)
        jitter = sscale if self.affine else 0.0
        initScale = np.random.normal(1.0, jitter, shape).astype(self.calctype)

        self.setVar("scale", Variable(gpuarray.to_gpu(initScale)))
        self.setVar("bias", Variable(gpuarray.zeros(shape, dtype=self.calctype)))

        self.setAttr("mean", gpuarray.zeros(shape, dtype=self.calctype))
        self.setAttr("var", gpuarray.to_gpu(np.ones(shape, dtype=self.calctype)))

    def _blendFactor(self):
        """Decaying running-stats blend weight, floored at minFactor."""
        from puzzlelib_tpu import fusedctx

        if fusedctx.active():
            import jax.numpy as jnp
            return jnp.maximum(self.initFactor / fusedctx.stepOr(1), self.minFactor)

        self.numOfProps += 1
        return max(self.initFactor / self.numOfProps, self.minFactor)

    def updateData(self, data):
        if not self.train:
            self.data = batchNormNd(data, self.scale, self.bias, self.mean, self.var,
                                    self.epsilon, 0, True, out=data if self.inplace else None)
            return

        if self.inplace:
            raise ModuleError("%s: using inplace flag in train mode is prohibited" % self)

        self.data, self.savemean, self.saveinvvar = batchNormNd(
            data, self.scale, self.bias, self.mean, self.var, self.epsilon, self._blendFactor(), False
        )

    def updateGrad(self, grad):
        ingrad, dscale, dbias = batchNormNdBackward(
            self.inData, grad, self.scale, self.savemean, self.saveinvvar, self.epsilon
        )

        self.grad = ingrad
        if self.affine:
            self.scalegrad, self.biasgrad = dscale, dbias

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if not self.affine:
            return

        for varName, paramGrad in (("scale", self.scalegrad), ("bias", self.biasgrad)):
            acc = self.vars[varName].grad.ravel()
            Blas.addVectorToVector(paramGrad.ravel(), acc, out=acc, alpha=scale, beta=momentum)

    def dataShapeFrom(self, shape):
        return shape

    gradShapeFrom = dataShapeFrom

    def reset(self):
        super().reset()

        self.savemean = self.saveinvvar = None
        if self.affine:
            self.scalegrad = self.biasgrad = None

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
