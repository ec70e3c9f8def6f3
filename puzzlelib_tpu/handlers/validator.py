"""Validation handler (reference: /root/reference/Handlers/Validator.py)."""

from puzzlelib_tpu.handlers.handler import Handler


class Validator(Handler):
    def __init__(self, mod, cost, onBatchFinish=None, batchsize=128):
        super().__init__(mod, onBatchFinish, batchsize)

        self.error = 0.0
        self.cost = cost

    def validateFromHost(self, data, target, macroBatchSize=10000, onMacroBatchFinish=None):
        nstates = len(target) if isinstance(target, list) else 1
        state = {"error": [0.0] * nstates}

        self.module.evalMode()
        self.handleFromHost([data, target], state, macroBatchSize, onMacroBatchFinish, random=False)

        error = [error / self.getDataSize(target) for error in state["error"]]
        self.error = error if isinstance(target, list) else error[0]

        return self.error

    def validate(self, data, target):
        nstates = len(target) if isinstance(target, list) else 1
        state = {"error": [0.0] * nstates}

        self.module.evalMode()
        self.handle([data, target], state, random=False)

        error = [error / self.getDataSize(target) for error in state["error"]]
        self.error = error if isinstance(target, list) else error[0]

        return self.error

    def handleBatch(self, batch, idx, state):
        data, target = batch
        error = state["error"]

        batchError = self.cost.validate(self.module(data), target)
        batchError = batchError if isinstance(batchError, list) else [batchError]

        for i in range(len(error)):
            error[i] += self.getDataSize(data) * batchError[i]
