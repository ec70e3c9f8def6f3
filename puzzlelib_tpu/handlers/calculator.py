"""Batched inference handler with host/device result assembly
(reference: /root/reference/Handlers/Calculator.py)."""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.handlers.handler import Handler


class Calculator(Handler):
    def calcFromHost(self, data, macroBatchSize=10000, onMacroBatchFinish=None):
        state = {"hostSize": self.getDataSize(data)}

        self.module.evalMode()
        self.handleFromHost(data, state, macroBatchSize, onMacroBatchFinish, random=False)

        return state["hostData"]

    def calc(self, data):
        state = {"devSize": self.getDataSize(data)}

        self.module.evalMode()
        self.handle(data, state, random=False)

        return state["devData"]

    def onMacroBatchStart(self, idx, macroBatchSize, state):
        # clamp to the actual extent of the final (possibly partial) macro-batch;
        # the reference reserves the full macroBatchSize and breaks when the
        # dataset is smaller than one macro-batch
        extent = macroBatchSize
        if "hostSize" in state:
            extent = min(extent, state["hostSize"] - idx * macroBatchSize)

        state["devSize"] = extent

    def onMacroBatchFinish(self, idx, macroBatchSize, state):
        if "hostData" not in state:
            def reserveHostData(data):
                return np.empty((state["hostSize"], ) + data.shape[1:], dtype=data.dtype)

            state["hostData"] = self.parseShapeTree(state["devData"], onData=reserveHostData)

        def copyHostData(indata, outdata):
            start = idx * macroBatchSize
            outdata[start:start + indata.shape[0]] = indata.get()

        self.parseShapeTree(state["devData"], copyHostData, state["hostData"])
        del state["devData"]

    def handleBatch(self, batch, idx, state):
        self._storeBatch(self.module(batch), idx, state)

    def _storeBatch(self, outBatch, idx, state):
        if "devData" not in state:
            def reserveDevData(data):
                return gpuarray.empty((state["devSize"], ) + data.shape[1:], dtype=data.dtype)

            state["devData"] = self.parseShapeTree(outBatch, onData=reserveDevData)

        def copyDevData(indata, outdata):
            gpuarray.copy(outdata[idx * self.batchsize:(idx + 1) * self.batchsize], indata)

        self.parseShapeTree(outBatch, copyDevData, state["devData"])
