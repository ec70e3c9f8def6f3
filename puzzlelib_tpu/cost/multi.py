"""Multi-cost aggregation for multi-output nets (reference: /root/reference/Cost/Multi.py)."""

from puzzlelib_tpu.cost.cost import Cost


class Multi(Cost):
    def __init__(self):
        self.costs = []
        super().__init__()

        self.devErr = None
        self.accumErr = None

    def append(self, cost):
        self.costs.append(cost)
        return self

    def resetAccumulator(self):
        for cost in self.costs:
            cost.resetAccumulator()

    def updateState(self, samples):
        for cost in self.costs:
            cost.updateState(samples)

    def resetDeviceAccumulator(self):
        for cost in self.costs:
            cost.resetDeviceAccumulator()

    def getError(self):
        if self.dirty:
            self.error = [cost.getError() for cost in self.costs]
            self.dirty = False

        return self.error

    def getMeanError(self):
        return [cost.getMeanError() for cost in self.costs]

    def calcGrad(self, preds, targets):
        grads = []

        for i, cost in enumerate(self.costs):
            cost.grad = cost.calcGrad(preds[i], targets[i])
            grads.append(cost.grad)

        return grads

    def calcError(self, preds, targets):
        for i, cost in enumerate(self.costs):
            cost.calcError(preds[i], targets[i])

    def calcVal(self, preds, targets):
        return [cost.calcVal(preds[i], targets[i]) for i, cost in enumerate(self.costs)]

    def checkDataShape(self, preds, targets):
        assert len(preds) == len(targets)

        for i, cost in enumerate(self.costs):
            cost.checkDataShape(preds[i], targets[i])

    def checkValDataShape(self, preds, targets):
        assert len(preds) == len(targets)

        for i, cost in enumerate(self.costs):
            cost.checkValDataShape(preds[i], targets[i])

    def getBatchsize(self, preds):
        return preds[0].shape[0]
