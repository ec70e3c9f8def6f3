"""Architecture serialization (reference: /root/reference/Blueprint.py).

Every module records its constructor args (``Module.registerBlueprint``); a
net's JSON blueprint is stored inside its HDF5 checkpoint and
``BlueprintFactory`` rebuilds the architecture from it, then ``load`` restores
the weights.
"""

import json

import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.modules.module import Module
from puzzlelib_tpu.containers.node import Node


class BlueprintError(Exception):
    pass


class BlueprintFactory:
    def __init__(self):
        import puzzlelib_tpu.containers as containersPkg
        import puzzlelib_tpu.modules as modulesPkg

        from puzzlelib_tpu.containers.container import Container

        self.containers = {
            name: cls for name, cls in vars(containersPkg).items()
            if isinstance(cls, type) and issubclass(cls, Container) and cls is not Container
        }

        self.modules = {
            name: cls for name, cls in vars(modulesPkg).items()
            if isinstance(cls, type) and issubclass(cls, Module)
            and not issubclass(cls, Container) and cls is not Module
        }

        # container-shaped modules live outside the containers package but
        # rebuild through the container path (lazily re-exported to dodge the
        # import cycle, so vars() scans never see them)
        from puzzlelib_tpu.modules.switchmoe import SwitchMoE
        self.containers["SwitchMoE"] = SwitchMoE

    def build(self, blueprint, log=False):
        classname, scheme = blueprint["classname"], blueprint["scheme"]

        if classname in self.containers:
            graph, elements = blueprint["graph"], blueprint["modules"]

            if classname in {"Sequential", "Parallel", "Pipeline"}:
                mod = self.containers[classname](name=scheme["name"])

                for name in graph:
                    mod.append(self.build(elements[name], log=log))

            elif classname == "Graph":
                nodes = {name: Node(self.build(bprint, log=log)) for name, bprint in elements.items()}

                for node in nodes.values():
                    node.addBackwards([(nodes[name], slots) for name, slots in graph[node.name]])

                inputs = [nodes[name] for name in blueprint["inputs"]]
                outputs = [nodes[name] for name in blueprint["outputs"]]

                mod = self.containers[classname](inputs, outputs, name=scheme["name"])

            else:
                # scheme-carrying containers (SwitchMoE): ctor kwargs from the
                # scheme, then append the recorded children in graph order
                mod = self.containers[classname](**scheme)

                for name in graph:
                    mod.append(self.build(elements[name], log=log))

        elif classname in self.modules:
            if "initscheme" in scheme:
                scheme = dict(scheme)
                scheme["initscheme"] = "none"

            mod = self.modules[classname](**scheme)

        else:
            raise BlueprintError("Cannot build module with class name '%s'" % classname)

        if log:
            Config.getLogger().info("Loaded %s", mod)

        return mod


def load(hdf, name=None, assumeUniqueNames=False, log=False):
    with Module.ensureHdf(hdf, "r") as hdf:
        blueprint = json.loads(str(np.array(hdf["blueprint"], dtype=str)))

        if log:
            Config.getLogger().info("Building model from blueprint ...")

        mod = BlueprintFactory().build(blueprint, log=log)

        if log:
            Config.getLogger().info("Loading model data ...")

        mod.load(hdf, name=name, assumeUniqueNames=assumeUniqueNames, isRoot=False)

    return mod
