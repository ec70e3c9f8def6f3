"""Container base: a Module owning named child modules.

API parity target: /root/reference/Containers/Container.py.  The persistence
schema is shared with leaf modules (see ``puzzlelib_tpu.hdf``): a container
contributes its children's state recursively plus an ``attrs.<name>`` group
for container-level attributes.  Unlike the reference, save/load here reuse
Module's single orchestration path — containers only override the tree hooks
(``_writeState`` / ``_readState``) and the error flavor.
"""

import numpy as np

from puzzlelib_tpu.modules.module import Module, ModuleError


class ContainerError(ModuleError):
    pass


class Container(Module):
    _errorKind = "Container"
    _errorType = ContainerError

    def __init__(self, name=None):
        super().__init__(name)
        self.modules = {}

    # -- child registry ----------------------------------------------------------

    def append(self, mod, acquire=True):
        if mod.name is None:
            mod.name = str(len(self.modules))

        elif mod.name in self.modules:
            if not acquire:
                raise ContainerError("Module with name '%s' is already in container" % mod.name)

            mod.name = str(len(self.modules))

        self.modules[mod.name] = mod
        return self

    def removeModule(self, mod):
        del self.modules[mod.name]
        return mod

    def __getitem__(self, item):
        if not isinstance(item, str):
            raise NotImplementedError(type(item).__name__)

        return self.modules[item]

    def getByName(self, name):
        found = self.modules.get(name)

        if found is None:
            for child in self.modules.values():
                if isinstance(child, Container):
                    found = child.getByName(name)
                    if found is not None:
                        break

        return found

    def getAllByType(self, typ):
        matches = []

        for child in self.modules.values():
            if isinstance(child, typ):
                matches.append(child)
            elif isinstance(child, Container):
                matches.extend(child.getAllByType(typ))

        return matches

    # -- variable / attribute routing ------------------------------------------------

    def _route(self, name):
        """Split 'child.rest' at the first dot."""
        child, dot, rest = name.partition(".")

        if not dot:
            raise ContainerError("Cannot find dot-delimiter in variable name: %s" % name)

        return self.modules[child], rest

    def setVar(self, name, var):
        child, rest = self._route(name)
        child.setVar(rest, var)

    def getVar(self, name):
        child, rest = self._route(name)
        return child.getVar(rest)

    def getVarTable(self, vartable=None, name=None, root=True):
        prefix = "" if root else name

        if vartable is None:
            vartable = {}

        for child in self.modules.values():
            child.getVarTable(vartable, "%s%s." % (prefix, child.name), root=False)

        return vartable

    def _attrKey(self, name):
        return "%s.%s" % (self.name or "", name)

    def setAttr(self, name, attr):
        self.attrs[self._attrKey(name)] = attr

    def getAttr(self, name):
        return self.attrs[self._attrKey(name)]

    def hasAttr(self, name):
        return self._attrKey(name) in self.attrs

    # -- aggregate module protocol ------------------------------------------------------

    def zeroGradParams(self):
        for child in self.modules.values():
            child.zeroGradParams()

    def updateParams(self, learnRate):
        for child in self.modules.values():
            child.updateParams(learnRate)

    def genericCheckDataType(self, dtype):
        pass

    def trainMode(self):
        super().trainMode()
        for child in self.modules.values():
            child.trainMode()

    def evalMode(self):
        super().evalMode()
        for child in self.modules.values():
            child.evalMode()

    def calcMode(self, T):
        for child in self.modules.values():
            try:
                child.calcMode(T)
            except Exception as e:
                self.handleError(child, e)

    def reset(self):
        super().reset()
        for child in self.modules.values():
            child.reset()

    def numOfParams(self):
        return sum(child.numOfParams() for child in self.modules.values())

    def paramSize(self, unit=None):
        nbytes = sum(child.paramSize(unit=None) for child in self.modules.values())
        return nbytes if unit is None else self.convertUnit(nbytes, unit=unit)

    # -- persistence ------------------------------------------------------------------------

    def _checkpointPath(self, name, assumeUniqueNames):
        # containers never squash their own path; children apply the
        # unique-names squash at their own level (reference parity)
        return name if name is not None else (self.name or "")

    def _writeState(self, hdf, varlinks, name, compress, assumeUniqueNames=False):
        for child in self.modules.values():
            child.save(hdf, varlinks, "%s.%s" % (name, child.name), compress=compress,
                       assumeUniqueNames=assumeUniqueNames, isRoot=False)

        # container attrs live in their own group, keyed by bare attr name
        grp = hdf.require_group("attrs.%s" % name)
        for attrName, attr in self.attrs.items():
            grp.create_dataset(attrName, data=attr)

    def _readState(self, hdf, initvars, name, assumeUniqueNames):
        for child in self.modules.values():
            child.load(hdf, initvars, "%s.%s" % (name, child.name),
                       assumeUniqueNames=assumeUniqueNames, isRoot=False)

        group = "attrs.%s" % name
        if group in hdf:
            for attrName, attr in hdf[group].items():
                self.attrs[attrName] = np.array(attr)

    # -- blueprint / misc -----------------------------------------------------------------------

    def getBlueprint(self):
        blueprint = super().getBlueprint()
        blueprint["modules"] = {name: child.getBlueprint() for name, child in self.modules.items()}

        return blueprint

    def handleError(self, mod, e):
        detail = str(e)
        raise ContainerError("%s:\nModule (%s) error:\n%s%s" %
                             (self, mod, type(e), ": %s" % detail if detail else ""))

    def __str__(self):
        return "Container %s (name: %s)" % (type(self).__name__, self.name)

    def updateData(self, data):
        raise NotImplementedError()

    def updateGrad(self, grad):
        raise NotImplementedError()

    def dataShapeFrom(self, shape):
        raise NotImplementedError()

    def gradShapeFrom(self, shape):
        raise NotImplementedError()
