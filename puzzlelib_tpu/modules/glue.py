"""Reference: /root/reference/Modules/Glue.py."""

from puzzlelib_tpu.modules.module import ModuleError, Module


class Glue(Module):
    def __init__(self, modules=None, fwdGlue=None, bwdGlue=None, fwdShapeGlue=None, bwdShapeGlue=None, name=None):
        super().__init__(name)

        if modules is not None and not isinstance(modules, dict):
            raise ModuleError("Modules object must be non-empty dictionary")

        self.modules = modules
        self.fwdGlue = fwdGlue
        self.bwdGlue = bwdGlue
        self.fwdShapeGlue = fwdShapeGlue
        self.bwdShapeGlue = bwdShapeGlue

    def updateData(self, data):
        self.data = self.fwdGlue(data, self.modules)

    def updateGrad(self, grad):
        self.grad = self.bwdGlue(grad, self.modules)

    def dataShapeFrom(self, shape):
        if self.fwdShapeGlue is not None:
            return self.fwdShapeGlue(shape)

        raise ModuleError("Forward shape glue hook is not installed")

    def gradShapeFrom(self, shape):
        if self.bwdShapeGlue is not None:
            return self.bwdShapeGlue(shape)

        raise ModuleError("Backward shape glue hook is not installed")
