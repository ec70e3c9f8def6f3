"""Reference: /root/reference/Modules/MaxPool2D.py."""

from puzzlelib_tpu.backend.kernels import pool as Pool
from puzzlelib_tpu.backend.dnn import PoolMode, poolNd, poolNdBackward
from puzzlelib_tpu.modules.pool2d import Pool2D


class MaxPool2D(Pool2D):
    def __init__(self, size=2, stride=2, pad=0, useMask=False, name=None):
        super().__init__(size, stride, pad, name)
        self.registerBlueprint(locals())

        self.useMask = useMask
        self.mask = None
        self.mode = PoolMode.max

    @property
    def withMask(self):
        return self.useMask

    @withMask.setter
    def withMask(self, val):
        self.useMask = val
        self.gradUsesOutData = False if val else True

    def updateData(self, data):
        if self.useMask:
            self.data, self.mask = Pool.maxpool2d(data, size=self.size, stride=self.stride, pad=self.pad)
        else:
            self.data, self.workspace = poolNd(
                data, size=self.size, stride=self.stride, pad=self.pad, mode=self.mode, test=not self.train
            )

    def updateGrad(self, grad):
        if self.useMask:
            self.grad = Pool.maxpool2dBackward(grad, self.inData.shape, self.mask,
                                               size=self.size, stride=self.stride, pad=self.pad)
        else:
            self.grad = poolNdBackward(self.inData, self.data, grad, self.workspace,
                                       size=self.size, stride=self.stride, pad=self.pad, mode=self.mode)

    def reset(self):
        super().reset()
        self.mask = None
