"""Reference: /root/reference/Modules/MapLRN.py."""

from puzzlelib_tpu.backend.dnn import mapLRN, mapLRNBackward
from puzzlelib_tpu.modules.lrn import LRN


class MapLRN(LRN):
    def __init__(self, N=5, alpha=1e-4, beta=0.75, K=2.0, name=None):
        super().__init__(N, alpha, beta, K, name)

    def updateData(self, data):
        self.data, self.workspace = mapLRN(data, None, N=self.N, alpha=self.alpha, beta=self.beta, K=self.K,
                                           test=not self.train)

    def updateGrad(self, grad):
        self.grad = mapLRNBackward(self.inData, self.data, grad, None, self.workspace,
                                   N=self.N, alpha=self.alpha, beta=self.beta, K=self.K)
