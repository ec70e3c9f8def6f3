"""Reference: /root/reference/Modules/MaxPool3D.py."""

from puzzlelib_tpu.backend.dnn import PoolMode
from puzzlelib_tpu.modules.pool3d import Pool3D


class MaxPool3D(Pool3D):
    def __init__(self, size=2, stride=2, pad=0, name=None):
        super().__init__(size, stride, pad, name)
        self.registerBlueprint(locals())

        self.mode = PoolMode.max
