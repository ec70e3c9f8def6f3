"""Reference: /root/reference/Modules/BatchNorm2D.py."""

from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.modules.batchnormnd import BatchNormND


class BatchNorm2D(BatchNormND):
    def __init__(self, maps, epsilon=1e-5, initFactor=1.0, minFactor=0.1, sscale=0.01, affine=True, name=None,
                 empty=False, inplace=False):
        super().__init__(2, maps, epsilon, initFactor, minFactor, sscale, affine, name, empty, inplace)
        self.registerBlueprint(locals())

    def checkDataShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Data must be 4d tensor")

        if shape[1] != self.maps:
            raise ModuleError("Data has %d maps (expected: %d)" % (shape[1], self.maps))

    def checkGradShape(self, shape):
        if len(shape) != 4:
            raise ModuleError("Grad must be 4d tensor")

        if shape[1] != self.maps:
            raise ModuleError("Grad has %d maps (expected: %d)" % (shape[1], self.maps))
