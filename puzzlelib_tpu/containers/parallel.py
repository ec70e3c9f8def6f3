"""Branch-parallel container over a list of inputs.

API parity target: /root/reference/Containers/Parallel.py — N sibling modules
each consume the matching element of a list input (Inception towers, SentiNet
branches).  Branches are dispatched sequentially here; inside a fused step the
XLA scheduler overlaps them freely since they are data-independent.
"""

from puzzlelib_tpu.modules.module import ModuleError
from puzzlelib_tpu.containers.container import Container


class Parallel(Container):
    def __init__(self, name=None):
        super().__init__(name)
        self.graph = []

    # -- dataflow hints ------------------------------------------------------------

    @property
    def gradUsesOutData(self):
        return any(branch.gradUsesOutData for branch in self.graph)

    @gradUsesOutData.setter
    def gradUsesOutData(self, val):
        pass

    @property
    def inplace(self):
        return any(getattr(branch, "inplace", False) for branch in self.graph[:-1])

    # -- branch editing --------------------------------------------------------------

    def append(self, mod, acquire=True):
        super().append(mod, acquire)
        self.graph.append(mod)

        return self

    def extend(self, container, acquire=True):
        branches = container.graph if isinstance(container, Parallel) else container

        for mod in branches:
            self.append(mod, acquire)

    def pop(self):
        mod = self.graph.pop()
        return super().removeModule(mod)

    def __getitem__(self, item):
        if isinstance(item, int):
            return self.graph[item]

        if isinstance(item, slice):
            sub = Parallel()
            sub.extend(self.graph[item])
            return sub

        return super().__getitem__(item)

    def getByIndex(self, index):
        return self.graph[index]

    def getBlueprint(self):
        blueprint = super().getBlueprint()
        blueprint["graph"] = [branch.name for branch in self.graph]

        return blueprint

    def optimizeForShape(self, shapes, memlimit=None):
        for branch, shape in zip(self.graph, shapes):
            branch.optimizeForShape(shape, memlimit)

    # -- forward / backward -------------------------------------------------------------

    def _eachBranch(self, inputs, kind, visit):
        """Apply ``visit`` to every (branch, input) pair with error context."""
        assert len(inputs) == len(self.graph)
        results = []

        for index, (branch, feed) in enumerate(zip(self.graph, inputs)):
            try:
                results.append(visit(branch, feed))
            except ModuleError as e:
                raise ModuleError("%s:\n%s error in module %d (%s):\n%s" % (self, kind, index, branch, e))
            except Exception as e:
                self.handleError(branch, e)

        return results

    def updateData(self, data):
        self.data = self._eachBranch(data, "Data", lambda branch, feed: branch(feed))

    def backward(self, grad, updParamGrads=True, updGrad=True, scale=1.0, momentum=1.0):
        def visit(branch, feed):
            branch.backward(feed, updParamGrads=updParamGrads, updGrad=updGrad,
                            scale=scale, momentum=momentum)
            return branch.grad

        self.grad = self._eachBranch(grad, "Grad", visit)

    def dataShapeFrom(self, shapes):
        return [branch.dataShapeFrom(shape) for branch, shape in zip(self.graph, shapes)]

    def gradShapeFrom(self, shapes):
        return [branch.gradShapeFrom(shape) for branch, shape in zip(self.graph, shapes)]

    def updateGrad(self, grad):
        assert False
