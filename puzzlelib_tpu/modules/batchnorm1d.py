"""Reference: /root/reference/Modules/BatchNorm1D.py."""

from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.modules.batchnormnd import BatchNormND


class BatchNorm1D(BatchNormND):
    def __init__(self, maps, epsilon=1e-5, initFactor=1.0, minFactor=0.1, sscale=0.01, affine=True, name=None,
                 empty=False, inplace=False):
        super().__init__(1, maps, epsilon, initFactor, minFactor, sscale, affine, name, empty, inplace)
        self.registerBlueprint(locals())

    def checkDataShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Data must be 3d tensor")

        if shape[1] != self.maps:
            raise ModuleError("Data has %d maps (expected: %d)" % (shape[1], self.maps))

    def checkGradShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Grad must be 3d tensor")

        if shape[1] != self.maps:
            raise ModuleError("Grad has %d maps (expected: %d)" % (shape[1], self.maps))
