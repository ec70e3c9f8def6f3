"""DAG container (reference: /root/reference/Containers/Graph.py)."""

from puzzlelib_tpu.containers.container import ContainerError, Container
from puzzlelib_tpu.containers.node import Node


class Graph(Container):
    def __init__(self, inputs, outputs, unsafe=False, nodesOnly=False, name=None):
        super().__init__(name)

        self.unsafe = unsafe

        self.inputs = [inputs] if not isinstance(inputs, list) else inputs

        impureInputs = [inp.name for inp in self.inputs if len(inp.bwds) > 0]
        if len(impureInputs) > 0:
            raise ContainerError("Found input nodes with parents: %s" % ", ".join(impureInputs))

        self.outputs = [outputs] if not isinstance(outputs, list) else outputs

        impureOutputs = [output.name for output in self.outputs if len(output.fwds) > 0]
        if len(impureOutputs) > 0:
            raise ContainerError("Found output nodes with ancestors: %s" % ", ".join(impureOutputs))

        self.nodes = {}

        for inp in self.inputs:
            inp.traverseForward(inp, lambda node: self.gatherTopology(node, nodesOnly))

        unvisited = [output.name for output in self.outputs if not output.fwdVisited]
        if len(unvisited) > 0:
            raise ContainerError("Could not visit output nodes: %s" % ", ".join(unvisited))

        self.reset()

    def gatherTopology(self, node, nodesOnly):
        if not nodesOnly:
            self.append(node.module)

        assert node.name not in self.nodes
        self.nodes[node.name] = node

        if getattr(node.module, "inplace", False) and not self.unsafe:
            for fwd in node.fwds:
                if len(fwd[0].bwds) > 1:
                    raise ContainerError("Invalid inplace mode - module %s has non-trivial ancestor %s" %
                                         (node.module, fwd[0]))

            for bwd in node.bwds:
                if len(bwd[0].fwds) > 1:
                    raise ContainerError("Invalid inplace mode - module %s has non-trivial parent %s" %
                                         (node.module, bwd[0]))

    def getBlueprint(self):
        blueprint = super().getBlueprint()

        blueprint["graph"] = {node.name: [(n.name, slots) for n, slots in node.bwds] for node in self.nodes.values()}
        blueprint["inputs"] = [inp.name for inp in self.inputs]
        blueprint["outputs"] = [output.name for output in self.outputs]

        return blueprint

    def getNodeByName(self, name):
        return self.nodes[name]

    def optimizeForShape(self, shape, memlimit=None):
        self.graphDataShape(shape, lambda module, sh: module.optimizeForShape(sh, memlimit))

    def updateData(self, data):
        data = data if isinstance(data, list) else [data]

        for i, inp in enumerate(self.inputs):
            inp.forward(data[i])

        self.data = self.outputs[0].data if len(self.outputs) == 1 else [output.data for output in self.outputs]
        self.clearTraverse()

    def dataShapeFrom(self, shape):
        return self.graphDataShape(shape, None)

    def graphDataShape(self, shape, onmodule):
        shape = shape if isinstance(shape, list) else [shape]

        inshapes = {inp.name: shape[i] for i, inp in enumerate(self.inputs)}
        shapes = {}

        for inp in self.inputs:
            inp.traverseForward(inp, Node.dataShapeFrom, inshapes, shapes, onmodule)

        outshapes = [shapes[output.name] for output in self.outputs]

        if len(self.outputs) == 1:
            outshapes = outshapes[0]

        self.clearTraverse()
        return outshapes

    def backward(self, grad, updParamGrads=True, updGrad=True, scale=1.0, momentum=1.0):
        grad = grad if isinstance(grad, list) else [grad]

        for i, output in enumerate(self.outputs):
            output.backward(grad[i], updParamGrads=updParamGrads, updGrad=updGrad, scale=scale, momentum=momentum)

        self.grad = self.inputs[0].grad if len(self.inputs) == 1 else [inp.grad for inp in self.inputs]
        self.clearTraverse()

    def gradShapeFrom(self, shape):
        shape = shape if isinstance(shape, list) else [shape]

        outshapes = {output.name: shape[i] for i, output in enumerate(self.outputs)}
        shapes = {}

        for output in self.outputs:
            output.traverseBackward(output, Node.gradShapeFrom, outshapes, shapes)

        inshape = [shapes[inp.name] for inp in self.inputs]

        if len(self.inputs) == 1:
            inshape = inshape[0]

        self.clearTraverse()
        return inshape

    def updateGrad(self, grad):
        assert False

    def reset(self):
        super().reset()
        for node in self.nodes.values():
            node.reset()

    def clearTraverse(self):
        for node in self.nodes.values():
            node.clearTraverse()
