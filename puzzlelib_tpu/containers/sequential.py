"""Sequential container — an ordered pipeline of modules.

API parity target: /root/reference/Containers/Sequential.py.  Keeps the
reference's inplace-compatibility validation: an inplace module may not
consume the output of a producer whose backward pass re-reads its own output
(``gradUsesOutData``), looking through shape-only "data movers".  On TPU these
flags are hints (XLA owns buffer reuse), but the validation is kept so nets
port between frameworks without surprises.
"""

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.containers.container import ContainerError, Container


class Sequential(Container):
    def __init__(self, name=None):
        super().__init__(name)
        self.graph = []

    # -- dataflow hint propagation ----------------------------------------------

    @property
    def gradUsesOutData(self):
        # the container's effective flag is that of its last non-mover child
        for mod in reversed(self.graph):
            if not mod.movesData:
                return mod.gradUsesOutData

        return False

    @gradUsesOutData.setter
    def gradUsesOutData(self, val):
        pass

    @staticmethod
    def _edgeIsInplace(mods, moverFlag):
        """True if the first non-mover module at this end is inplace."""
        for mod in mods:
            if getattr(mod, moverFlag):
                continue

            return bool(getattr(mod, "inplace", False))

        return True

    @property
    def inplace(self):
        return (self._edgeIsInplace(self.graph, "movesData") or
                self._edgeIsInplace(reversed(self.graph), "movesGrad"))

    # -- pipeline editing -----------------------------------------------------------

    def append(self, mod, acquire=True):
        if self.graph:
            self.checkModulesCompatibility(self.graph[-1], mod)

        super().append(mod, acquire)
        self.graph.append(mod)

        return self

    def extend(self, container, acquire=True):
        mods = container.graph if isinstance(container, Sequential) else container

        for mod in mods:
            self.append(mod, acquire)

    def pop(self):
        mod = self.graph.pop()
        return super().removeModule(mod)

    def insert(self, mod, index):
        if index > 0:
            self.checkModulesCompatibility(self.graph[index - 1], mod)

        super().append(mod)
        self.graph.insert(index, mod)

    def insertAfter(self, mod, name):
        index = self.getModuleIndex(name)
        self.checkModulesCompatibility(self.graph[index], mod)

        super().append(mod)
        self.graph.insert(index + 1, mod)

    def checkModulesCompatibility(self, before, incoming):
        if Config.disableModuleCompatChecks or not getattr(incoming, "inplace", False):
            return

        # find the module whose buffer the inplace op would actually clobber:
        # ``before`` itself, or — if it only moves data — the producer behind it
        if before.gradUsesOutData:
            hazard = before
        else:
            index = self.getModuleIndex(before.name)
            while index >= 0 and self.graph[index].movesData:
                index -= 1

            hazard = self.graph[index] if index >= 0 and self.graph[index].gradUsesOutData else None

        if hazard is not None:
            raise ContainerError(
                "%s: Can't insert inplace module %s after module %s (gradient uses outdata)" %
                (self, incoming, hazard)
            )

    # -- lookup -------------------------------------------------------------------------

    def __getitem__(self, item):
        if isinstance(item, int):
            return self.graph[item]

        if isinstance(item, slice):
            assert item.step is None or item.step == 1

            sub = Sequential()
            sub.extend(self.graph[item])
            return sub

        return super().__getitem__(item)

    def getByIndex(self, index):
        return self.graph[index]

    def getModuleIndex(self, name):
        for index, mod in enumerate(self.graph):
            if mod.name == name:
                return index

        raise ContainerError("%s: Module %s not found" % (self, name))

    def getBlueprint(self):
        blueprint = super().getBlueprint()
        blueprint["graph"] = [mod.name for mod in self.graph]

        return blueprint

    def optimizeForShape(self, shape, memlimit=None):
        for mod in self.graph:
            mod.optimizeForShape(shape, memlimit)
            shape = mod.dataShapeFrom(shape)

    # -- forward / backward ----------------------------------------------------------------

    def _childFailure(self, kind, index, mod, exc):
        if isinstance(exc, ModuleError):
            raise ModuleError("%s:\n%s error in module %d (%s):\n%s" % (self, kind, index, mod, exc))

        self.handleError(mod, exc)

    def updateData(self, data):
        flowing = data

        for index, mod in enumerate(self.graph):
            try:
                mod(flowing)
            except Exception as e:
                self._childFailure("Data", index, mod, e)

            flowing = mod.data

        self.data = flowing

    def backward(self, grad, updParamGrads=True, updGrad=True, scale=1.0, momentum=1.0):
        flowing = grad

        for index in range(len(self.graph) - 1, -1, -1):
            mod = self.graph[index]
            # only the pipeline head honors the caller's updGrad; interior
            # modules always produce an input gradient for their predecessor
            needInGrad = updGrad if index == 0 else True

            try:
                mod.backward(flowing, updParamGrads=updParamGrads, updGrad=needInGrad,
                             scale=scale, momentum=momentum)
            except Exception as e:
                self._childFailure("Grad", index, mod, e)

            flowing = mod.grad

        self.grad = flowing

    def dataShapeFrom(self, shape):
        for mod in self.graph:
            shape = mod.dataShapeFrom(shape)

        return shape

    def gradShapeFrom(self, shape):
        for mod in reversed(self.graph):
            shape = mod.gradShapeFrom(shape)

        return shape

    def updateGrad(self, grad):
        assert False
