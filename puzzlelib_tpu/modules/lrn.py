"""Local-response-normalization base.

API parity target: /root/reference/Modules/LRN.py — shared hyperparameter
container for MapLRN / CrossMapLRN.  Shapes pass through unchanged; a
``workspace`` slot caches whatever the backend kernel wants to reuse between
the forward and backward passes (the denominator tensor on TPU).
"""

from puzzlelib_tpu.modules.module import ModuleError, Module


class LRN(Module):
    def __init__(self, N=5, alpha=1e-4, beta=0.75, K=2.0, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        # window size / scaling / exponent / bias of the LRN denominator
        self.N, self.alpha, self.beta, self.K = N, alpha, beta, K
        self.workspace = None

    def _expectRank4(self, shape, what):
        if len(shape) != 4:
            raise ModuleError("%s must be 4d tensor" % what)

    def dataShapeFrom(self, shape):
        return shape

    def checkDataShape(self, shape):
        self._expectRank4(shape, "Data")

    def checkGradShape(self, shape):
        self._expectRank4(shape, "Grad")

    # normalization preserves shape, so the grad map is the data map
    gradShapeFrom = dataShapeFrom

    def reset(self):
        super().reset()
        self.workspace = None
