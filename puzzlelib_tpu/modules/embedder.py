"""Word embedding module.

API parity target: /root/reference/Modules/Embedder.py — gather rows of W by
int32 token index; the backward pass is a scatter-add into W's gradient (no
input gradient exists).  The vocabulary round-trips through checkpoints as a
variable-length-string attribute.
"""

import h5py
import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.embedder import embed, embedBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


def _vocabArray(vocabulary):
    """Normalize the ctor vocabulary argument to (size, string-array)."""
    strDt = h5py.special_dtype(vlen=str)

    if isinstance(vocabulary, int):
        return vocabulary, np.empty((0, ), dtype=strDt)

    if isinstance(vocabulary, dict):
        words = np.empty((len(vocabulary), ), dtype=strDt)
        for word, idx in vocabulary.items():
            words[int(idx)] = word

        return len(vocabulary), words

    raise ModuleError("Unrecognized vocabulary parameter type")


class Embedder(Module):
    def __init__(self, vocabulary, sentlength, embsize, onVocabulary=None, initscheme="uniform", wscale=1.0,
                 learnable=True, name=None):
        super().__init__(name)
        ctorArgs = dict(locals())

        self.embsize, self.sentlength = embsize, sentlength
        self.learnable = learnable
        self.wgrad, self.outgrad = None, None

        vocabsize, words = _vocabArray(vocabulary)

        self.vocab = None
        self.setAttr("vocab", words)

        ctorArgs["vocabulary"] = vocabsize
        self.registerBlueprint(ctorArgs, exclude=["onVocabulary"])

        W = self.createTensorWithScheme(initscheme, (vocabsize, embsize), wscale, (embsize, vocabsize))
        if W is None:
            W = np.empty((vocabsize, embsize), dtype=np.float32)

        if onVocabulary is not None:
            onVocabulary(W)

        self.W = None
        self.setVar("W", Variable(gpuarray.to_gpu(W)))

        self.varLoader = self.checkVarOnLoad
        self.attrLoader = self.checkAttrOnLoad

    # -- checkpoint hooks (embedding tables may change vocab size on load) -------

    def checkVarOnLoad(self, paramName, dataset):
        if paramName != "W":
            raise ModuleError("Unknown parameter name '%s' for embedder" % paramName)

        if dataset.shape[1] != self.embsize:
            raise ModuleError("Expected embedding size %s, was given %s" % (self.embsize, dataset.shape[1]))

        self.setVar("W", Variable(gpuarray.to_gpu(dataset)))

    def checkAttrOnLoad(self, attrName, dataset):
        if attrName != "vocab":
            raise ModuleError("Unknown attribute name '%s' for embedder" % attrName)

        self.setAttr("vocab", dataset)

    def getVocabulary(self):
        if not self.hasAttr("vocab"):
            return {}

        return {word: index for index, word in enumerate(self.vocab)}

    # -- compute -------------------------------------------------------------------

    def verifyData(self, data):
        lo = int(gpuarray.minimum(data).get())
        if lo < -1:
            raise ModuleError("Embedder data verification failed, found index %s (< -1)" % lo)

        hi = int(gpuarray.maximum(data).get())
        if hi >= self.W.shape[0]:
            raise ModuleError("Embedder data verification failed, found index %s (vocabulary size is %s)" %
                              (hi, self.W.shape[0]))

    def updateData(self, data):
        if Config.verifyData:
            self.verifyData(data)

        self.data = embed(data, self.W)

    def updateGrad(self, grad):
        self.grad = None  # tokens are not differentiable

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        self.outgrad = grad
        self.vars["W"].grad.fill(0.0)

        if self.learnable:
            embedBackwardParams(self.inData, grad, self.vars["W"].grad, scale)

    def updateParams(self, learnRate):
        if self.learnable:
            embedBackwardParams(self.inData, self.outgrad, self.vars["W"].data, learnRate)

    # -- shape/dtype contracts ------------------------------------------------------

    def dataShapeFrom(self, shape):
        return shape[0], shape[1], self.embsize

    def gradShapeFrom(self, shape):
        raise ModuleError("Gradient propagation is undefined")

    def checkDataShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Data must be 2d matrix")

        if shape[1] != self.sentlength:
            raise ModuleError("Expected %d data sentence length, %d was given" % (self.sentlength, shape[1]))

    def checkGradShape(self, shape):
        if len(shape) != 3:
            raise ModuleError("Grad must be 3d tensor")

        expectations = (
            (shape[1], self.sentlength, "Expected %d grad sentence length, %d was given"),
            (shape[2], self.embsize, "Expected %d grad embedding size, %d was given"),
            (shape[0], self.inData.shape[0], "Expected %d grad batch size, %d was given"),
        )
        for given, expected, message in expectations:
            if given != expected:
                raise ModuleError(message % (expected, given))

    def checkDataType(self, dtype):
        if dtype != np.int32:
            raise ModuleError("Expected int32-tensor (got dtype %s)" % dtype)

    def reset(self):
        super().reset()
        self.outgrad = None

    def calcMode(self, T):
        self.requireSupportedDtype(T)
        self.castVarsTo(T)
