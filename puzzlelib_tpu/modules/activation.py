"""Elementwise activation module.

Parity surface: /root/reference/Modules/Activation.py (activation names,
default args, ``slc``/``inplace`` flags, blueprint capture). Each activation
is a pure jnp expression from ``ops.elementwise`` that XLA fuses into its
producer; ``slc`` applies it to a flat slice and passes the rest through.
"""

from enum import Enum

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.backend.gpuarray import memoryPool as memPool
from puzzlelib_tpu.ops import elementwise as ew
from puzzlelib_tpu.modules.module import ModuleError, Module


class ActivationType(str, Enum):
    sigmoid = "sigmoid"
    tanh = "tanh"
    relu = "relu"
    leakyRelu = "leakyRelu"
    elu = "elu"
    softPlus = "softPlus"
    clip = "clip"


sigmoid = ActivationType.sigmoid
tanh = ActivationType.tanh
relu = ActivationType.relu
leakyRelu = ActivationType.leakyRelu
elu = ActivationType.elu
softPlus = ActivationType.softPlus
clip = ActivationType.clip


# activation -> (forward fn, derivative fn taking (outgrad, outdata), default args)
_FUNCS = {
    ActivationType.sigmoid: (ew.sigmoid, ew.sigmoidDer, ()),
    ActivationType.tanh: (ew.tanh, ew.tanhDer, ()),
    ActivationType.relu: (ew.relu, ew.reluDer, ()),
    ActivationType.leakyRelu: (ew.leakyRelu, ew.leakyReluDer, (0.01, )),
    ActivationType.elu: (ew.elu, ew.eluDer, (1.0, )),
    ActivationType.softPlus: (ew.softPlus, ew.softPlusDer, ()),
    ActivationType.clip: (ew.clip, ew.clipDer, (0.0, 6.0)),
}


def _overSlice(fn, tensors, args, slc):
    """fn over the whole arrays, or over a flat slice with pass-through
    elsewhere (the CUDA strided-slice ElementwiseKernel semantics)."""
    if slc is None:
        return fn(*tensors, *args)

    head = tensors[0].ravel()
    tail = [t.ravel()[slc] for t in tensors[1:]]
    return head.at[slc].set(fn(head[slc], *tail, *args)).reshape(tensors[0].shape)


class Activation(Module):
    def __init__(self, activation, slc=None, inplace=False, name=None, args=()):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.gradUsesOutData = True

        self.inplace = inplace
        if inplace and Config.showWarnings:
            Config.getLogger().info("Warning: %s is using inplace flag", self)

        self.activation = ActivationType(activation)
        if self.activation not in _FUNCS:
            raise ModuleError("Unrecognized activation %s" % activation)

        self.slc = slc
        self.actArgs = tuple(args) if len(args) > 0 else _FUNCS[self.activation][2]

    def _outputInto(self, src):
        return src if self.inplace else gpuarray.empty(src.shape, dtype=src.dtype, allocator=memPool)

    def updateData(self, data):
        fwd = _FUNCS[self.activation][0]

        self.data = self._outputInto(data)
        self.data._write(_overSlice(fwd, (data.jax, ), self.actArgs, self.slc))

    def updateGrad(self, grad):
        der = _FUNCS[self.activation][1]

        self.grad = self._outputInto(grad)
        self.grad._write(_overSlice(der, (grad.jax, self.data.jax), self.actArgs, self.slc))

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape

    def calcMode(self, T):
        self.supportedDtypesCalcMode(T)
