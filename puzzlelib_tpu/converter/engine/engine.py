"""Compiled inference engine as a Module
(reference: /root/reference/Converter/TensorRT/RTEngine.py - the engine object
is itself a Module usable inside inference graphs)."""

import json
import os

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.modules.module import ModuleError, Module


class Engine(Module):
    def __init__(self, enginepath, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        from jax import export as jexport

        with open(enginepath, "rb") as f:
            self.exported = jexport.deserialize(f.read())

        self.enginepath = enginepath

        specpath = enginepath.replace(".engine", ".spec.json")
        self.spec = None

        if os.path.exists(specpath):
            with open(specpath) as f:
                self.spec = json.load(f)

    def updateData(self, data):
        result = self.exported.call(data.jax)
        self.data = gpuarray.GPUArray(result)

    def updateGrad(self, grad):
        raise ModuleError("Engine is inference-only")

    def dataShapeFrom(self, shape):
        if self.spec is not None:
            return (shape[0], ) + tuple(self.spec["outshape"][1:])

        raise ModuleError("No spec available for shape inference")

    def gradShapeFrom(self, shape):
        raise ModuleError("Engine is inference-only")

    def checkDataShape(self, shape):
        if self.spec is not None and list(shape) != self.spec["inshape"]:
            raise ModuleError("Engine expects input shape %s (got %s)" % (self.spec["inshape"], list(shape)))
