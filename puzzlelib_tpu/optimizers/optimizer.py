"""Optimizer base.

API parity target: /root/reference/Optimizers/Optimizer.py.  Global-state mode
repacks every parameter/gradient of a dtype into one fused ``SharedArray``
buffer; module variables become write-through views of it, so the whole update
(and, under data parallelism, the gradient all-reduce) is a single fused
operation over one flat array — on TPU that flat pair is exactly what the
traced train step carries as donated state.
"""

from collections import OrderedDict

import numpy as np
import h5py

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.variable import Variable


class Optimizer:
    def __init__(self, nodeinfo=None):
        self.t = 0
        self.learnRate = 0.0

        self.attrs = {"t", "learnRate"}

        self.module = None
        self.states = {}
        self.hooks = []

        self.shParams, self.shGrads = {}, {}

        self.globalState = False
        self.globalVar = OrderedDict()

        self.customVars = []
        self.nodeinfo = nodeinfo

    # -- hyper-parameter registry ----------------------------------------------

    def setAttr(self, name, attr):
        setattr(self, name, attr)
        self.attrs.add(name)

    def getAttrDict(self):
        return {attrName: getattr(self, attrName) for attrName in self.attrs}

    def addHook(self, hook):
        if self.globalState and Config.showWarnings:
            Config.getLogger().info("Warning: adding hook to optimizer in global state mode")

        self.hooks.append(hook)

    # -- setup -------------------------------------------------------------------

    def setupOn(self, mod, useGlobalState=False):
        if self.nodeinfo is not None:
            assert useGlobalState

        self.module = mod
        vartable = self.module.getVarTable()

        self.globalState = useGlobalState
        if useGlobalState:
            self.setupGlobalState(vartable)
        else:
            self.setupLocalStates(vartable)

        if self.nodeinfo is not None:
            assert not self.customVars

    def _partitionVars(self, vartable):
        """Split the var table into (framework-managed, custom-updater) lists,
        deterministically ordered by each variable's first link name."""
        managed = []

        for var, names in sorted(vartable.items(), key=lambda item: item[1][0]):
            if var.hasUpdater:
                self.customVars.append(names[0])
            else:
                managed.append((names[0], names, var))

        return managed

    def setupGlobalState(self, vartable):
        managed = self._partitionVars(vartable)

        if self.customVars:
            assert self.nodeinfo is None

        # phase 1: lay out one flat (param, grad) buffer pair per dtype
        for lead, _, var in managed:
            dtype = var.data.dtype.type

            packer = self.shParams.setdefault(dtype, gpuarray.SharedArray(dtype))
            packer.register(var.data.shape, dtype, lead)

            gradPacker = self.shGrads.setdefault(dtype, gpuarray.SharedArray(dtype))
            gradPacker.register(var.grad.shape, dtype, lead)

        for dtype in self.shParams:
            self.shParams[dtype].build()
            self.shGrads[dtype].build()

            self.globalVar[dtype] = Variable(self.shParams[dtype].ary, grad=self.shGrads[dtype].ary)

        # phase 2: copy values in and rebind module vars as views of the pack
        for lead, names, var in managed:
            dtype = var.data.dtype.type
            view, gradView = self.shParams[dtype][lead], self.shGrads[dtype][lead]

            view.set(var.data)
            gradView.set(var.grad)

            for name in names:
                self.module.setVar(name, Variable(view, grad=gradView))

        # phase 3: per-dtype optimizer state (+ initial param sync across nodes)
        for dtype, globalVar in self.globalVar.items():
            if self.nodeinfo is not None:
                self.nodeinfo.broadcastBuffer("data", globalVar.data)

            self.states[dtype] = self.setupState(globalVar)

    def setupLocalStates(self, vartable):
        for lead, _, var in self._partitionVars(vartable):
            self.states[lead] = self.setupState(var)

    def setupState(self, var):
        return {}

    # -- gradient clearing ------------------------------------------------------------

    def zeroGradParams(self):
        if self.globalState:
            self.zeroGradGlobalParams()
        else:
            self.zeroGradLocalParams()

    def zeroGradGlobalParams(self):
        for globalVar in self.globalVar.values():
            globalVar.grad.fill(0)

    def zeroGradLocalParams(self):
        for name in self.states:
            var = self.module.getVar(name)

            if not var.hasUpdater:
                var.grad.fill(0)

    # -- update step --------------------------------------------------------------------

    def update(self, useStreams=False, sync=True):
        self.t += 1

        if self.globalState:
            self.updateGlobalState()
        else:
            self.updateLocalStates(useStreams, sync)

        for name in self.customVars:
            self.module.getVar(name).update(self.learnRate)

    def updateGlobalState(self):
        for dtype, globalVar in self.globalVar.items():
            state = self.states[dtype]

            for hook in self.hooks:
                hook(globalVar, state)

            # fused-buffer all-reduce: one collective per dtype, not per var
            if self.nodeinfo is not None:
                self.nodeinfo.sumTensor("grad", globalVar.grad)

            if globalVar.learnRate > 0.0:
                self.updateVar(globalVar, state)

    def updateLocalStates(self, useStreams, sync):
        streams = gpuarray.streamManager.borrow(len(self.states)) if useStreams else None

        for i, (name, state) in enumerate(self.states.items()):
            var = self.module.getVar(name)

            assert var.grad is not None and var.data.shape == var.grad.shape

            stream = streams[i] if useStreams else None

            for hook in self.hooks:
                hook(var, state, stream)

            if var.learnRate > 0.0:
                self.updateVar(var, state, stream)

        if useStreams:
            if sync:
                for stream in streams:
                    stream.synchronize()

            gpuarray.streamManager.give(streams)

    def updateVar(self, var, state, stream=None):
        raise NotImplementedError()

    # -- optimizer-state persistence ---------------------------------------------------------

    def save(self, hdf, name=None):
        hdf = self.ensureHdf(hdf, "w")
        prefix = name or ""

        if self.attrs:
            grp = hdf.create_group(prefix + ".attrs")
            for attrName, attr in self.getAttrDict().items():
                grp.create_dataset(attrName, data=attr)

        if self.states:
            grp = hdf.create_group(prefix + ".states")
            for stateName, state in self.states.items():
                for entityName, entity in state.items():
                    grp.create_dataset("%s.%s" % (stateName, entityName), data=entity.get())

    def load(self, hdf, name=None):
        hdf = self.ensureHdf(hdf, "r")
        prefix = name or ""

        grpName = prefix + ".attrs"
        if grpName in hdf:
            for attrName, attr in hdf[grpName].items():
                kind = type(getattr(self, attrName))
                self.setAttr(attrName, kind(np.array(attr)))

        if self.states:
            grp = hdf[prefix + ".states"]
            for stateName, state in self.states.items():
                for entityName, entity in state.items():
                    entity.set(np.array(grp["%s.%s" % (stateName, entityName)]))

    @staticmethod
    def ensureHdf(file, mode):
        return h5py.File(file, mode) if isinstance(file, str) else file
