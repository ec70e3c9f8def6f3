"""Branch-parallel container over a list of inputs
(reference: /root/reference/Containers/Parallel.py).  On TPU the branches are
independent XLA computations the scheduler overlaps freely."""

from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.containers.container import Container


class Parallel(Container):
    def __init__(self, name=None):
        super().__init__(name)
        self.graph = []

    @property
    def gradUsesOutData(self):
        return any(mod.gradUsesOutData for mod in self.graph)

    @gradUsesOutData.setter
    def gradUsesOutData(self, val):
        pass

    @property
    def inplace(self):
        return any(getattr(mod, "inplace", False) for mod in self.graph[:-1])

    def getBlueprint(self):
        blueprint = super().getBlueprint()
        blueprint["graph"] = [mod.name for mod in self.graph]

        return blueprint

    def append(self, mod, acquire=True):
        super().append(mod, acquire)
        self.graph.append(mod)

        return self

    def extend(self, container, acquire=True):
        if isinstance(container, Parallel):
            container = container.graph

        for mod in container:
            self.append(mod, acquire)

    def pop(self):
        mod = self.graph.pop()
        super().removeModule(mod)

        return mod

    def __getitem__(self, item):
        if isinstance(item, str):
            return super().__getitem__(item)

        elif isinstance(item, int):
            return self.graph[item]

        elif isinstance(item, slice):
            parallel = Parallel()
            parallel.extend(self.graph[item.start:item.stop:item.step])
            return parallel

        else:
            raise NotImplementedError(type(item).__name__)

    def getByIndex(self, index):
        return self.graph[index]

    def optimizeForShape(self, shapes, memlimit=None):
        for i, mod in enumerate(self.graph):
            mod.optimizeForShape(shapes[i], memlimit)

    def updateData(self, data):
        assert len(data) == len(self.graph)
        self.data = []

        for i, mod in enumerate(self.graph):
            try:
                mod(data[i])

            except ModuleError as e:
                raise ModuleError("%s:\nData error in module %d (%s):\n%s" % (self, i, mod, e))

            except Exception as e:
                self.handleError(mod, e)

            self.data.append(mod.data)

    def dataShapeFrom(self, shapes):
        return [mod.dataShapeFrom(shapes[i]) for i, mod in enumerate(self.graph)]

    def backward(self, grad, updParamGrads=True, updGrad=True, scale=1.0, momentum=1.0):
        assert len(grad) == len(self.graph)
        self.grad = []

        for i, mod in enumerate(self.graph):
            try:
                mod.backward(grad[i], updParamGrads=updParamGrads, updGrad=updGrad, scale=scale, momentum=momentum)

            except ModuleError as e:
                raise ModuleError("%s:\nGrad error in module %d (%s):\n%s" % (self, i, mod, e))

            except Exception as e:
                self.handleError(mod, e)

            self.grad.append(mod.grad)

    def gradShapeFrom(self, shapes):
        return [mod.gradShapeFrom(shapes[i]) for i, mod in enumerate(self.graph)]

    def updateGrad(self, grad):
        assert False
