"""Per-activation batch norm on 2d (batch, size) data.

Parity surface: /root/reference/Modules/BatchNorm.py — running-stat factor
schedule (``initFactor/minFactor``), affine switch, ``empty``/``inplace``
flags. The op is the backend's per-activation batch norm over a 4d view;
inside a fused step the factor comes from the device-side step counter
(``fusedctx``) so the whole schedule stays one traced program.
"""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.dnn import BatchNormMode, batchNormNd, batchNormNdBackward

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class BatchNorm(Module):
    def __init__(self, size, epsilon=1e-5, initFactor=1.0, minFactor=0.1, sscale=0.01, affine=True, name=None,
                 empty=False, inplace=False):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.size = size
        self.epsilon = epsilon
        self.initFactor, self.minFactor = initFactor, minFactor
        self.numOfProps = 0
        self.affine = affine

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        self.scale = self.bias = self.mean = self.var = None
        self._saved = None       # (mean, invvar) from the training forward
        self._paramGrads = None  # (dscale, dbias) from the backward

        if not empty:
            self._initState(sscale)

    def _initState(self, sscale):
        stat = (1, self.size, 1, 1)

        jitter = sscale if self.affine else 0.0
        self.setVar("scale", Variable(gpuarray.to_gpu(
            np.random.normal(1.0, jitter, stat).astype(np.float32))))
        self.setVar("bias", Variable(gpuarray.zeros(stat, dtype=np.float32)))

        self.setAttr("mean", gpuarray.zeros(stat, dtype=np.float32))
        self.setAttr("var", gpuarray.to_gpu(np.ones(stat, dtype=np.float32)))

    def _statFactor(self):
        """Running-stat blend weight: initFactor/step, floored at minFactor.
        Under a fused trace the step count is the device-side counter."""
        from puzzlelib_tpu import fusedctx

        if fusedctx.active():
            import jax.numpy as jnp
            return jnp.maximum(self.initFactor / fusedctx.stepOr(1), self.minFactor)

        self.numOfProps += 1
        return max(self.initFactor / self.numOfProps, self.minFactor)

    def _as4d(self, tensor):
        return tensor.reshape(tensor.shape[0], self.size, 1, 1)

    def updateData(self, data):
        view = self._as4d(data)

        if self.train:
            if self.inplace:
                raise ModuleError("%s: using inplace flag in train mode is prohibited" % self)

            out, savemean, saveinvvar = batchNormNd(
                view, self.scale, self.bias, self.mean, self.var, self.epsilon,
                self._statFactor(), False, BatchNormMode.perActivation
            )
            self._saved = (savemean, saveinvvar)
        else:
            out = batchNormNd(
                view, self.scale, self.bias, self.mean, self.var, self.epsilon, 0, True,
                BatchNormMode.perActivation, out=view if self.inplace else None
            )

        self.data = out.reshape(*data.shape)

    def updateGrad(self, grad):
        savemean, saveinvvar = self._saved

        ingrad, dscale, dbias = batchNormNdBackward(
            self._as4d(self.inData), self._as4d(grad), self.scale,
            savemean, saveinvvar, self.epsilon, mode=BatchNormMode.perActivation
        )

        self._paramGrads = (dscale, dbias) if self.affine else None
        self.grad = ingrad.reshape(*grad.shape)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if self.affine:
            dscale, dbias = self._paramGrads
            self.foldParamGrad("scale", dscale, scale, momentum)
            self.foldParamGrad("bias", dbias, scale, momentum)

    def reset(self):
        super().reset()
        self._saved = self._paramGrads = None

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def checkDataShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Data must be 2d matrix")

        if shape[1] != self.size:
            raise ModuleError("Expected %d data dimensions, %d were given" % (self.size, shape[1]))

    def checkGradShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Grad must be 2d matrix")
