"""Per-activation batch norm on 2d data (reference: /root/reference/Modules/BatchNorm.py)."""

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray, blas as Blas
from puzzlelib_tpu.backend.dnn import BatchNormMode, batchNormNd, batchNormNdBackward

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class BatchNorm(Module):
    def __init__(self, size, epsilon=1e-5, initFactor=1.0, minFactor=0.1, sscale=0.01, affine=True, name=None,
                 empty=False, inplace=False):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        self.size = size
        self.epsilon = epsilon
        self.initFactor = initFactor
        self.minFactor = minFactor
        self.numOfProps = 0

        self.affine = affine

        self.scale, self.bias, self.mean, self.var = None, None, None, None
        self.savemean, self.saveinvvar, self.scalegrad, self.biasgrad = None, None, None, None

        if empty:
            return

        shape = (1, size, 1, 1)
        scale = np.random.normal(1.0, sscale if affine else 0.0, shape).astype(np.float32)

        self.setVar("scale", Variable(gpuarray.to_gpu(scale)))
        self.setVar("bias", Variable(gpuarray.zeros(shape, dtype=np.float32)))

        self.setAttr("mean", gpuarray.zeros(shape, dtype=np.float32))
        self.setAttr("var", gpuarray.to_gpu(np.ones(shape, dtype=np.float32)))

    def updateData(self, data):
        indata = data.reshape(data.shape[0], self.size, 1, 1)

        if self.train:
            if self.inplace:
                raise ModuleError("%s: using inplace flag in train mode is prohibited" % self)

            from puzzlelib_tpu import fusedctx

            if fusedctx.active():
                import jax.numpy as jnp
                factor = jnp.maximum(self.initFactor / fusedctx.stepOr(1), self.minFactor)
            else:
                self.numOfProps += 1
                factor = max(self.initFactor / self.numOfProps, self.minFactor)

            self.data, self.savemean, self.saveinvvar = batchNormNd(
                indata, self.scale, self.bias, self.mean, self.var, self.epsilon, factor, False,
                BatchNormMode.perActivation
            )
        else:
            self.data = batchNormNd(
                indata, self.scale, self.bias, self.mean, self.var, self.epsilon, 0, True,
                BatchNormMode.perActivation, out=indata if self.inplace else None
            )

        self.data = self.data.reshape(*data.shape)

    def updateGrad(self, grad):
        data = self.inData.reshape(self.inData.shape[0], self.size, 1, 1)
        outgrad = grad.reshape(grad.shape[0], self.size, 1, 1)

        tup = batchNormNdBackward(
            data, outgrad, self.scale, self.savemean, self.saveinvvar, self.epsilon,
            mode=BatchNormMode.perActivation
        )

        if self.affine:
            self.grad, self.scalegrad, self.biasgrad = tup
        else:
            self.grad, _, _ = tup

        self.grad = self.grad.reshape(*grad.shape)

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        if self.affine:
            Blas.addVectorToVector(
                self.scalegrad.ravel(), self.vars["scale"].grad.ravel(),
                out=self.vars["scale"].grad.ravel(), alpha=scale, beta=momentum
            )
            Blas.addVectorToVector(
                self.biasgrad.ravel(), self.vars["bias"].grad.ravel(),
                out=self.vars["bias"].grad.ravel(), alpha=scale, beta=momentum
            )

    def dataShapeFrom(self, shape):
        return shape

    def checkDataShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Data must be 2d matrix")

        if shape[1] != self.size:
            raise ModuleError("Expected %d data dimensions, %d were given" % (self.size, shape[1]))

    def gradShapeFrom(self, shape):
        return shape

    def checkGradShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Grad must be 2d matrix")

    def reset(self):
        super().reset()

        self.savemean, self.saveinvvar = None, None
        if self.affine:
            self.scalegrad, self.biasgrad = None, None
