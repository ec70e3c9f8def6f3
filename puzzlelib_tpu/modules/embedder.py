"""Word embedding module (reference: /root/reference/Modules/Embedder.py)."""

import h5py
import numpy as np

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.kernels.embedder import embed, embedBackwardParams

from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module


class Embedder(Module):
    def __init__(self, vocabulary, sentlength, embsize, onVocabulary=None, initscheme="uniform", wscale=1.0,
                 learnable=True, name=None):
        super().__init__(name)
        args = dict(locals())

        self.embsize = embsize
        self.sentlength = sentlength

        self.wgrad = None
        self.learnable = learnable
        self.outgrad = None

        dt = h5py.special_dtype(vlen=str)

        if isinstance(vocabulary, dict):
            vocabsize = len(vocabulary)
            vocab = np.empty(shape=(vocabsize, ), dtype=dt)

            for word, idx in vocabulary.items():
                vocab[int(idx)] = word

        elif isinstance(vocabulary, int):
            vocabsize = vocabulary
            vocab = np.empty(shape=(0, ), dtype=dt)

        else:
            raise ModuleError("Unrecognized vocabulary parameter type")

        self.vocab = None
        self.setAttr("vocab", vocab)

        args["vocabulary"] = vocabsize
        self.registerBlueprint(args, exclude=["onVocabulary"])

        Wshape = (vocabsize, embsize)
        W = self.createTensorWithScheme(initscheme, Wshape, wscale, (embsize, vocabsize))
        if W is None:
            W = np.empty(Wshape, dtype=np.float32)

        if onVocabulary is not None:
            onVocabulary(W)

        self.W = None
        self.setVar("W", Variable(gpuarray.to_gpu(W)))

        self.varLoader = self.checkVarOnLoad
        self.attrLoader = self.checkAttrOnLoad

    def checkVarOnLoad(self, paramName, dataset):
        if paramName == "W":
            if dataset.shape[1] != self.embsize:
                raise ModuleError("Expected embedding size %s, was given %s" % (self.embsize, dataset.shape[1]))

            self.setVar("W", Variable(gpuarray.to_gpu(dataset)))
        else:
            raise ModuleError("Unknown parameter name '%s' for embedder" % paramName)

    def checkAttrOnLoad(self, attrName, dataset):
        if attrName == "vocab":
            self.setAttr("vocab", dataset)
        else:
            raise ModuleError("Unknown attribute name '%s' for embedder" % attrName)

    def getVocabulary(self):
        voc = {}

        if self.hasAttr("vocab"):
            for i in range(self.vocab.shape[0]):
                voc[self.vocab[i]] = i

        return voc

    def verifyData(self, data):
        mn, mx = gpuarray.minimum(data).get(), gpuarray.maximum(data).get()

        if mn < -1:
            raise ModuleError("Embedder data verification failed, found index %s (< -1)" % mn)

        if mx >= self.W.shape[0]:
            raise ModuleError("Embedder data verification failed, found index %s (vocabulary size is %s)" %
                              (mx, self.W.shape[0]))

    def updateData(self, data):
        if Config.verifyData:
            self.verifyData(data)

        self.data = embed(data, self.W)

    def updateGrad(self, grad):
        self.grad = None

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        self.outgrad = grad
        self.vars["W"].grad.fill(0.0)

        if self.learnable:
            embedBackwardParams(self.inData, grad, self.vars["W"].grad, scale)

    def updateParams(self, learnRate):
        if self.learnable:
            embedBackwardParams(self.inData, self.outgrad, self.vars["W"].data, learnRate)

    def dataShapeFrom(self, shape):
        batchsize, sentlen = shape
        return batchsize, sentlen, self.embsize

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

        batchsize, sentlen, embsize = shape

        if sentlen != self.sentlength:
            raise ModuleError("Expected %d grad sentence length, %d was given" % (self.sentlength, sentlen))

        if embsize != self.embsize:
            raise ModuleError("Expected %d grad embedding size, %d was given" % (self.embsize, embsize))

        if batchsize != self.inData.shape[0]:
            raise ModuleError("Expected %d grad batch size, %d was given" % (self.inData.shape[0], batchsize))

    def checkDataType(self, dtype):
        if dtype != np.int32:
            raise ModuleError("Expected int32-tensor (got dtype %s)" % dtype)

    def reset(self):
        super().reset()
        self.outgrad = None

    def calcMode(self, T):
        dtypes = {dtype for dtype, _ in gpuarray.dtypesSupported()}
        if T not in dtypes:
            raise ModuleError("Unsupported dtype %s" % T)

        self.castVarsTo(T)
