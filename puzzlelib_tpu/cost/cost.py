"""Cost base class with device-resident error bookkeeping.

API parity target: /root/reference/Cost/Cost.py.  Two scalar accumulators live
on the device (``devErr`` = last-batch error sum, ``accumErr`` = running sum
across batches) so the training loop never forces a device→host sync unless an
error value is explicitly queried — on TPU that keeps the fused step a single
dispatch with no readback in the steady state.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray


class CostError(Exception):
    pass


def labelBounds(labels):
    """(min, max) of an int label tensor in ONE fused device→host readback.

    The reference reads min and max separately (two syncs,
    /root/reference/Cost/CrossEntropy.py:87); through the TPU relay each sync
    costs ~10 ms, so the pair is stacked device-side and read back together.
    """
    import jax.numpy as jnp

    lo, hi = np.asarray(jnp.stack([jnp.min(labels.jax), jnp.max(labels.jax)]))
    return int(lo), int(hi)


def requireLabelRange(tag, labels, low, high):
    """Raise CostError unless every label lies in [low, high]."""
    lo, hi = labelBounds(labels)

    if lo < low:
        raise CostError("%s labels verification failed, found index %s (< %s)" % (tag, lo, low))

    if hi > high:
        raise CostError("%s labels verification failed, found index %s (> %s)" % (tag, hi, high))


def _deviceScalar():
    return gpuarray.empty((), dtype=np.float32)


class Cost:
    def __init__(self):
        # device side: per-batch and running error sums
        self.devErr = _deviceScalar()
        self.accumErr = _deviceScalar()

        # host side: sample counters + cached readbacks
        self.batchsize = 0
        self.numOfSamples = 0

        self.error = None
        self.valError = None
        self.grad = None
        self.dirty = True

        self.resetAccumulator()

    # -- accumulator lifecycle -------------------------------------------------

    def resetDeviceAccumulator(self):
        self.accumErr.fill(0.0)

    def resetAccumulator(self):
        self.resetDeviceAccumulator()
        self.batchsize = self.numOfSamples = 0

    def updateState(self, samples):
        self.batchsize = samples
        self.numOfSamples += samples

    def reset(self):
        self.error = self.valError = self.grad = None

    # -- error queries (these are the only host syncs) -------------------------

    def getError(self):
        if self.dirty:
            self.error, self.dirty = float(self.devErr.get()) / self.batchsize, False

        return self.error

    def getMeanError(self):
        return float(self.accumErr.get()) / self.numOfSamples

    def getValError(self):
        return self.valError

    # -- evaluation protocol ----------------------------------------------------

    def _verifyBatch(self, pred, target):
        bothArrays = isinstance(pred, gpuarray.GPUArray) and isinstance(target, gpuarray.GPUArray)
        if bothArrays and pred.shape[0] != target.shape[0]:
            raise AssertionError("prediction/target batch mismatch: %d vs %d" %
                                 (pred.shape[0], target.shape[0]))

    def __call__(self, pred, target, queryError=True):
        self._verifyBatch(pred, target)
        self.checkDataShape(pred, target)

        self.reset()

        # subclasses may reuse self.grad inside calcError (e.g. MSE), so the
        # gradient must be published before the error kernel runs
        self.grad = grad = self.calcGrad(pred, target)
        self.calcError(pred, target)
        self.dirty = True
        self.updateState(self.getBatchsize(pred))

        if not queryError:
            return grad

        self.error = self.getError()
        return self.error, grad

    def validate(self, pred, target):
        self._verifyBatch(pred, target)
        self.checkValDataShape(pred, target)

        self.valError = self.calcVal(pred, target)
        return self.valError

    # -- subclass surface --------------------------------------------------------

    def calcGrad(self, pred, target):
        raise NotImplementedError()

    def calcError(self, pred, target):
        # default: calcGrad computed the batch error fused with the gradient
        # and left it in devErr; fold it into the running sum. Costs whose
        # error needs a separate computation (e.g. MSE) override this.
        self.accumErr += self.devErr

    def calcVal(self, pred, target):
        raise NotImplementedError()

    def calcValDev(self, pred, target):
        """Traced twin of ``calcVal``: the same per-batch validation error as
        a 0-d device array with NO host sync, so ``fused.FusedValidator`` can
        compile forward+validation into one program and read the accumulated
        error back once per epoch.  Data verification (``Config.verifyData``
        label-range syncs) stays on the eager ``calcVal`` path.  Costs with
        non-scalar validation (Multi) or no validation protocol (CTC) don't
        implement it — FusedValidator falls back to the eager path."""
        raise NotImplementedError()

    def checkDataShape(self, pred, target):
        pass

    def checkValDataShape(self, pred, target):
        pass

    def getBatchsize(self, pred):
        return pred.shape[0]
