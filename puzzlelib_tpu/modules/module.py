"""Module base class — the imperative layer protocol.

API contract follows /root/reference/Modules/Module.py:39-471: explicit
``updateData`` (forward), ``updateGrad`` (input gradient) and ``accGradParams``
(parameter gradient accumulation), HDF5 save/load with variable deduplication,
train/eval/calc modes and init schemes.  The compute inside each module
delegates to pure jitted functions from ``puzzlelib_tpu.ops``; backward passes
use explicit VJPs, so the same primitives serve the fused traced train step.
Checkpoint I/O is delegated to the schema codec in ``puzzlelib_tpu.hdf``.
"""

import math
import warnings
from enum import Enum

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu import hdf as hdfcodec
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.variable import Variable


class ModuleError(Exception):
    pass


class InitScheme(str, Enum):
    none = "none"
    xavier = "xavier"
    xavierUniform = "xavier_uniform"
    xavierNormal = "xavier_normal"
    he = "he"
    gaussian = "gaussian"
    uniform = "uniform"


class FactorType(str, Enum):
    in_ = "in"
    out = "out"
    avg = "avg"


class MemoryUnit(str, Enum):
    mb = "mb"
    kb = "kb"


def _mapNested(fn, data):
    """Apply ``fn`` to every leaf of a (possibly nested) list/tuple of arrays."""
    if isinstance(data, (tuple, list)):
        return [_mapNested(fn, item) for item in data]

    return fn(data)


class Module:
    # subclasses raising container-flavored errors override these two
    _errorKind = "Module"
    _errorType = ModuleError

    def __init__(self, name=None):
        self.name = name

        self.blueprint = None
        self.registerBlueprint(locals())

        self.vars = {}
        self.attrs = {}

        # dataflow hints consumed by Sequential's inplace validation
        self.gradUsesOutData = False
        self.movesData = False
        self.movesGrad = False

        self.inData, self.data, self.grad = None, None, None

        self.train = not Config.globalEvalMode
        self.calctype = np.float32

        # optional checkpoint interception hooks
        self.varLoader = None
        self.attrLoader = None

    # -- blueprint / variable registry ---------------------------------------

    def registerBlueprint(self, args, exclude=None):
        hidden = {"self", "__class__"}
        masked = set() if exclude is None else set(exclude)

        self.blueprint = {
            key: (None if key in masked else value)
            for key, value in args.items() if key not in hidden
        }

    def getBlueprint(self):
        return {"classname": type(self).__name__, "scheme": self.blueprint}

    def setVar(self, name, var):
        setattr(self, name, var.data)
        self.vars[name] = var

    def getVar(self, name):
        return self.vars[name]

    def getVarTable(self, vartable=None, name=None, root=True):
        if root and name is None:
            name = self.name or ""

        if vartable is None:
            vartable = {}

        for paramName, var in self.vars.items():
            vartable.setdefault(var, []).append("%s%s" % (name, paramName))

        return vartable

    def setAttr(self, name, attr):
        setattr(self, name, attr)
        self.attrs[name] = attr

    def hasAttr(self, name):
        return name in self.attrs

    def node(self, *nodes):
        from puzzlelib_tpu.containers.node import Node
        return Node(self, parents=list(nodes) if nodes else None)

    # -- forward / backward protocol -------------------------------------------

    def __call__(self, data):
        if not Config.disableDtypeShapeChecks:
            self.checkDataShape(self.acquireShapesFrom(data))
            self.checkDataType(self.acquireDtypesFrom(data))

        self.data, self.inData = None, data
        self.updateData(data)

        return self.data

    def backward(self, grad, updParamGrads=True, updGrad=True, scale=1.0, momentum=0.0):
        if not Config.disableDtypeShapeChecks:
            self.checkGradShape(self.acquireShapesFrom(grad))
            self.checkGradType(self.acquireDtypesFrom(grad))

        self.grad = None

        if updGrad:
            self.updateGrad(grad)

        if updParamGrads and self.train:
            self.accGradParams(grad, scale=scale, momentum=momentum)

    def updateData(self, data):
        raise NotImplementedError()

    def updateGrad(self, grad):
        raise NotImplementedError()

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        pass

    def foldParamGrad(self, name, newGrad, scale=1.0, momentum=0.0):
        """vars[name].grad = scale * newGrad + momentum * vars[name].grad,
        fused into one XLA op (the reference routes this through a per-var
        Blas.addVectorToVector, /root/reference/Modules/InstanceNorm2D.py:52)."""
        from puzzlelib_tpu.ops import elementwise as ew

        acc = self.vars[name].grad
        src = newGrad.jax if hasattr(newGrad, "jax") else newGrad
        acc._write(ew.add(src.reshape(acc.shape), scale, acc.jax, momentum))

    def zeroGradParams(self):
        for var in self.vars.values():
            if not var.hasUpdater:
                var.grad.fill(0)

    def updateParams(self, learnRate):
        from puzzlelib_tpu.backend import blas as Blas

        for var in self.vars.values():
            Blas.toVectorAddVector(var.data.ravel(), var.grad.ravel(), alpha=learnRate)

    def optimizeForShape(self, shape, memlimit=None):
        pass

    # -- persistence -------------------------------------------------------------

    def _checkpointPath(self, name, assumeUniqueNames):
        """Dotted path of this module inside the checkpoint namespace."""
        if name is None:
            name = self.name or ""

        if assumeUniqueNames and name:
            # collapse the middle of the path: root + leaf identify the module
            pieces = name.split(".")
            name = "%s.%s" % (pieces[0], pieces[-1])

        return name

    def _failPersist(self, verb, name, exc):
        raise self._errorType("%s %s %s error: %s" % (self._errorKind, name, verb, exc))

    def _writeState(self, hdf, varlinks, name, compress, assumeUniqueNames=False):
        """Leaf persistence: deduped vars + flat attr datasets."""
        for paramName, var in self.vars.items():
            hdfcodec.storeParam(hdf, "%s.%s" % (name, paramName), var, varlinks, compress)

        hdfcodec.storeAttrs(
            hdf, {"%s.%s" % (name, attrName): attr for attrName, attr in self.attrs.items()},
            compress=compress,
        )

    def _readState(self, hdf, initvars, name, assumeUniqueNames):
        for paramName, var in self.vars.items():
            if var in initvars:
                continue  # shared variable already restored through another link

            param = hdfcodec.fetchParam(hdf, "%s.%s" % (name, paramName))

            if self.varLoader is not None:
                self.varLoader(paramName, param)
            else:
                var.data.set(param.astype(var.data.dtype, casting="safe", copy=False))

            initvars[var] = True

        for attrName, attr in self.attrs.items():
            value = hdfcodec.fetchAttr(hdf, "%s.%s" % (name, attrName))

            if self.attrLoader is not None:
                self.attrLoader(attrName, value)
            elif isinstance(attr, gpuarray.GPUArray):
                attr.set(value.astype(attr.dtype, casting="safe", copy=False))
            else:
                np.copyto(attr, value.astype(attr.dtype, casting="safe", copy=False))

    def save(self, hdf=None, varlinks=None, name=None, compress="gzip", assumeUniqueNames=False,
             withBlueprint=False, isRoot=True):
        wantImage = hdf is None
        hdf, _ = hdfcodec.openStore(hdf, "w")

        name = self._checkpointPath(name, assumeUniqueNames)
        varlinks = {} if varlinks is None else varlinks

        image = None
        try:
            self._writeState(hdf, varlinks, name, compress, assumeUniqueNames)

            if withBlueprint:
                hdfcodec.storeBlueprint(hdf, self.getBlueprint())

            if isRoot and wantImage:
                image = hdfcodec.snapshot(hdf)

        except Exception as e:
            self._failPersist("save", name, e)

        finally:
            if isRoot:
                hdf.close()

        return image

    def load(self, hdf, initvars=None, name=None, assumeUniqueNames=False, isRoot=True):
        hdf, _ = hdfcodec.openStore(hdf, "r")

        name = self._checkpointPath(name, assumeUniqueNames)
        initvars = {} if initvars is None else initvars

        with warnings.catch_warnings():
            warnings.filterwarnings("error")

            try:
                self._readState(hdf, initvars, name, assumeUniqueNames)

            except Exception as e:
                self._failPersist("load", name, e)

            finally:
                if isRoot:
                    hdf.close()

    @staticmethod
    def ensureHdf(file, mode):
        store, _ = hdfcodec.openStore(file, mode)
        return store

    # -- modes ---------------------------------------------------------------------

    def trainMode(self):
        self.train = True
        self.reset()

    def evalMode(self):
        self.train = False
        self.reset()

    def calcMode(self, T):
        if T != np.float32:
            raise ModuleError("Unsupported dtype %s" % T)

        self.calctype = T

    def reset(self):
        self.inData, self.data, self.grad = None, None, None

    # -- shape / dtype validation -----------------------------------------------------

    def checkDataShape(self, shape):
        pass

    def checkGradShape(self, shape):
        pass

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()

    def checkDataType(self, dtype):
        self.genericCheckDataType(dtype)

    def checkGradType(self, dtype):
        self.genericCheckDataType(dtype)

    def genericCheckDataType(self, dtype):
        mismatched = []
        _mapNested(lambda d: mismatched.append(d) if d != self.calctype else None, dtype)

        if mismatched:
            raise ModuleError("Expected dtype %s, got %s" % (self.calctype, mismatched[0]))

    @classmethod
    def acquireShapesFrom(cls, data):
        return _mapNested(lambda d: d.shape, data)

    @classmethod
    def acquireDtypesFrom(cls, data):
        return _mapNested(lambda d: d.dtype, data)

    # -- introspection -------------------------------------------------------------------

    def numOfParams(self):
        return sum(var.data.size for var in self.vars.values())

    def paramSize(self, unit=None):
        nbytes = sum(var.data.nbytes for var in self.vars.values())
        return nbytes if unit is None else self.convertUnit(nbytes, unit=unit)

    def __str__(self):
        return "Module %s (name: %s)" % (type(self).__name__, self.name)

    # -- helpers ---------------------------------------------------------------------------

    def castVarsTo(self, T):
        """Recreate all vars in dtype T (shared helper for calcMode on
        parametric modules, mirroring ConvND.calcMode in the reference)."""
        if self.calctype == T:
            return

        variables = self.vars
        self.vars = {}

        for varName, var in variables.items():
            self.setVar(varName, Variable(
                var.data.astype(T), name=var.name, grad=var.grad.astype(T) if var.grad is not None else None
            ))

        self.calctype = T

    @staticmethod
    def requireSupportedDtype(T):
        dtypes = {dtype for dtype, _ in gpuarray.dtypesSupported()}

        if T not in dtypes:
            raise ModuleError("Unsupported dtype %s" % T)

    def supportedDtypesCalcMode(self, T):
        self.requireSupportedDtype(T)
        self.calctype = T

    @staticmethod
    def convertUnit(val, unit):
        return val / {MemoryUnit.kb: 1 << 10, MemoryUnit.mb: 1 << 20}[unit]

    @staticmethod
    def repeat(val, ntimes):
        return (val, ) * ntimes if isinstance(val, int) else tuple(val)

    # -- parameter initialization ------------------------------------------------------------

    @staticmethod
    def inferNeuronsNumber(shape, transpose):
        """Fan-out / fan-in pair of a parameter tensor shape."""
        if len(shape) == 1:
            fanOut = fanIn = shape[0]
        elif len(shape) == 2:
            fanIn, fanOut = shape
        else:
            field = int(np.prod(shape[2:]))
            fanOut, fanIn = shape[0] * field, shape[1] * field

        return (fanIn, fanOut) if transpose else (fanOut, fanIn)

    @staticmethod
    def createTensorWithScheme(scheme, shape, wscale, factorShape=None, factorTranspose=False, dtype=np.float32):
        factorType = FactorType.in_

        if isinstance(scheme, (tuple, list)):
            if len(scheme) != 2:
                raise ValueError("Scheme tuple has %s length, expected 2" % len(scheme))

            scheme, factorType = scheme

        scheme = None if scheme is None else InitScheme(scheme)

        outs, ins = Module.inferNeuronsNumber(shape if factorShape is None else factorShape, factorTranspose)
        factor = {
            FactorType.in_: ins,
            FactorType.out: outs,
            FactorType.avg: (outs + ins) / 2,
        }[FactorType(factorType)]

        # each scheme maps to (sampler, scale); None defaults to xavier-uniform
        samplers = {
            None: ("uniform", math.sqrt(3.0 / factor)),
            InitScheme.xavierUniform: ("uniform", math.sqrt(3.0 / factor)),
            InitScheme.xavier: ("normal", math.sqrt(1.0 / factor)),
            InitScheme.xavierNormal: ("normal", math.sqrt(1.0 / factor)),
            InitScheme.he: ("normal", math.sqrt(2.0 / factor)),
            InitScheme.gaussian: ("normal", wscale),
            InitScheme.uniform: ("uniform", wscale),
        }

        if scheme == InitScheme.none:
            return None

        kind, width = samplers[scheme]
        if kind == "uniform":
            tensor = np.random.uniform(-width, width, shape)
        else:
            tensor = np.random.normal(0.0, width, shape)

        return tensor.astype(dtype)
