"""Multi-cost aggregation for multi-output nets.

API parity target: /root/reference/Cost/Multi.py — a list of costs applied
pairwise to (preds[i], targets[i]); error queries return per-cost lists.
"""

from puzzlelib_tpu.cost.cost import Cost


class Multi(Cost):
    def __init__(self):
        self.costs = []
        super().__init__()

        # no own accumulators: each child cost keeps its own
        self.devErr = self.accumErr = None

    def append(self, cost):
        self.costs.append(cost)
        return self

    def _paired(self, preds, targets):
        return zip(self.costs, preds, targets)

    # -- fan-out of the accumulator protocol -------------------------------------

    def resetAccumulator(self):
        for cost in self.costs:
            cost.resetAccumulator()

    def resetDeviceAccumulator(self):
        for cost in self.costs:
            cost.resetDeviceAccumulator()

    def updateState(self, samples):
        for cost in self.costs:
            cost.updateState(samples)

    def getError(self):
        if self.dirty:
            self.error, self.dirty = [cost.getError() for cost in self.costs], False

        return self.error

    def getMeanError(self):
        return [cost.getMeanError() for cost in self.costs]

    # -- pairwise evaluation ---------------------------------------------------------

    def calcGrad(self, preds, targets):
        grads = []
        for cost, pred, target in self._paired(preds, targets):
            cost.grad = cost.calcGrad(pred, target)
            grads.append(cost.grad)

        return grads

    def calcError(self, preds, targets):
        for cost, pred, target in self._paired(preds, targets):
            cost.calcError(pred, target)

    def calcVal(self, preds, targets):
        return [cost.calcVal(pred, target) for cost, pred, target in self._paired(preds, targets)]

    def checkDataShape(self, preds, targets):
        assert len(preds) == len(targets)

        for cost, pred, target in self._paired(preds, targets):
            cost.checkDataShape(pred, target)

    def checkValDataShape(self, preds, targets):
        assert len(preds) == len(targets)

        for cost, pred, target in self._paired(preds, targets):
            cost.checkValDataShape(pred, target)

    def getBatchsize(self, preds):
        return preds[0].shape[0]
