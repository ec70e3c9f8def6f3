"""Reference: /root/reference/Modules/BatchNorm3D.py."""

from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.modules.batchnormnd import BatchNormND


class BatchNorm3D(BatchNormND):
    def __init__(self, maps, epsilon=1e-5, initFactor=1.0, minFactor=0.1, sscale=0.01, affine=True, name=None,
                 empty=False, inplace=False):
        super().__init__(3, maps, epsilon, initFactor, minFactor, sscale, affine, name, empty, inplace)
        self.registerBlueprint(locals())

    def checkDataShape(self, shape):
        if len(shape) != 5:
            raise ModuleError("Data must be 5d tensor")

        if shape[1] != self.maps:
            raise ModuleError("Data has %d maps (expected: %d)" % (shape[1], self.maps))

    def checkGradShape(self, shape):
        if len(shape) != 5:
            raise ModuleError("Grad must be 5d tensor")

        if shape[1] != self.maps:
            raise ModuleError("Grad has %d maps (expected: %d)" % (shape[1], self.maps))
