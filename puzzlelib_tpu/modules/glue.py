"""User-hook module: arbitrary forward/backward glue callables.

Parity surface: /root/reference/Modules/Glue.py — the four hook slots and the
optional module dictionary are the whole contract; the hooks receive the raw
data/grad plus the dictionary and return whatever the surrounding graph
expects.
"""

from puzzlelib_tpu.modules.module import ModuleError, Module


class Glue(Module):
    def __init__(self, modules=None, fwdGlue=None, bwdGlue=None, fwdShapeGlue=None, bwdShapeGlue=None, name=None):
        super().__init__(name)

        if modules is not None and not isinstance(modules, dict):
            raise ModuleError("Modules object must be non-empty dictionary")

        self.modules = modules

        self.fwdGlue, self.bwdGlue = fwdGlue, bwdGlue
        self.fwdShapeGlue, self.bwdShapeGlue = fwdShapeGlue, bwdShapeGlue

    def updateData(self, data):
        self.data = self.fwdGlue(data, self.modules)

    def updateGrad(self, grad):
        self.grad = self.bwdGlue(grad, self.modules)

    def dataShapeFrom(self, shape):
        if self.fwdShapeGlue is None:
            raise ModuleError("Forward shape glue hook is not installed")

        return self.fwdShapeGlue(shape)

    def gradShapeFrom(self, shape):
        if self.bwdShapeGlue is None:
            raise ModuleError("Backward shape glue hook is not installed")

        return self.bwdShapeGlue(shape)
