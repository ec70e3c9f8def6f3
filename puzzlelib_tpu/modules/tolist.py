"""Nested-input flattening module.

API parity target: /root/reference/Modules/ToList.py — forward flattens an
arbitrarily nested list of tensors into one flat list; backward re-nests the
flat gradient list to mirror the input structure.  Implemented over a pair of
generic tree utilities instead of the reference's four hand-rolled recursions.
"""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.modules.module import ModuleError, Module


def _leaves(tree, isLeaf):
    """Depth-first leaf iterator over a nested list structure."""
    if isLeaf(tree):
        yield tree
    else:
        for branch in tree:
            yield from _leaves(branch, isLeaf)


def _renest(template, flat, isLeaf):
    """Rebuild ``template``'s nesting from the flat sequence ``flat``."""
    cursor = iter(flat)

    def build(node):
        if isLeaf(node):
            return next(cursor)

        return [build(branch) for branch in node]

    return build(template)


def _isTensor(obj):
    return isinstance(obj, gpuarray.GPUArray)


class ToList(Module):
    def __init__(self, name=None):
        super().__init__(name)
        self.movesData = True
        self.movesGrad = True

    def updateData(self, data):
        self.data = list(_leaves(data, _isTensor))

    def updateGrad(self, grad):
        self.grad = _renest(self.inData, grad, _isTensor)

    def dataShapeFrom(self, shapes):
        # a leaf here is a shape tuple, not a tensor
        return list(_leaves(shapes, lambda node: isinstance(node, tuple)))

    def gradShapeFrom(self, shapes):
        return _renest(self.inData, shapes, _isTensor)

    def checkGradShape(self, shapes):
        for i, leaf in enumerate(_leaves(self.inData, _isTensor)):
            if leaf.shape != shapes[i]:
                raise ModuleError("Inconsistency in data and corresponding grad shapes at index %s "
                                  "(expected %s, given %s)" % (i, leaf.shape, shapes[i]))
