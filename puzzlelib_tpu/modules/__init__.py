"""Module zoo exports (parity with /root/reference/Modules/__init__.py)."""

from puzzlelib_tpu.modules.activation import (
    Activation, ActivationType, sigmoid, tanh, relu, leakyRelu, elu, softPlus, clip
)
from puzzlelib_tpu.modules.add import Add
from puzzlelib_tpu.modules.avgpool1d import AvgPool1D
from puzzlelib_tpu.modules.avgpool2d import AvgPool2D
from puzzlelib_tpu.modules.avgpool3d import AvgPool3D
from puzzlelib_tpu.modules.batchnorm import BatchNorm
from puzzlelib_tpu.modules.batchnorm1d import BatchNorm1D
from puzzlelib_tpu.modules.batchnorm2d import BatchNorm2D
from puzzlelib_tpu.modules.batchnorm3d import BatchNorm3D
from puzzlelib_tpu.modules.cast import Cast, DataType
from puzzlelib_tpu.modules.concat import Concat
from puzzlelib_tpu.modules.conv1d import Conv1D
from puzzlelib_tpu.modules.conv2d import Conv2D
from puzzlelib_tpu.modules.conv3d import Conv3D
from puzzlelib_tpu.modules.crossmaplrn import CrossMapLRN
from puzzlelib_tpu.modules.deconv1d import Deconv1D
from puzzlelib_tpu.modules.deconv2d import Deconv2D
from puzzlelib_tpu.modules.deconv3d import Deconv3D
from puzzlelib_tpu.modules.depthconcat import DepthConcat
from puzzlelib_tpu.modules.dropout import Dropout
from puzzlelib_tpu.modules.dropout2d import Dropout2D
from puzzlelib_tpu.modules.embedder import Embedder
from puzzlelib_tpu.modules.flatten import Flatten
from puzzlelib_tpu.modules.gelu import Gelu
from puzzlelib_tpu.modules.glue import Glue
from puzzlelib_tpu.modules.grouplinear import GroupLinear, GroupMode
from puzzlelib_tpu.modules.identity import Identity
from puzzlelib_tpu.modules.instancenorm2d import InstanceNorm2D
from puzzlelib_tpu.modules.kmaxpool import KMaxPool
from puzzlelib_tpu.modules.lcn import LCN
from puzzlelib_tpu.modules.layernorm import LayerNorm
from puzzlelib_tpu.modules.attention import MultiHeadAttention
from puzzlelib_tpu.modules.linear import Linear
from puzzlelib_tpu.modules.maplrn import MapLRN
from puzzlelib_tpu.modules.maxpool1d import MaxPool1D
from puzzlelib_tpu.modules.maxpool2d import MaxPool2D
from puzzlelib_tpu.modules.maxpool3d import MaxPool3D
from puzzlelib_tpu.modules.maxunpool2d import MaxUnpool2D
from puzzlelib_tpu.modules.module import Module, ModuleError, InitScheme, MemoryUnit
from puzzlelib_tpu.modules.moveaxis import MoveAxis
from puzzlelib_tpu.modules.mul import Mul
from puzzlelib_tpu.modules.muladdconst import MulAddConst
from puzzlelib_tpu.modules.noiseinjector import NoiseInjector, InjectMode, NoiseType
from puzzlelib_tpu.modules.pad1d import Pad1D
from puzzlelib_tpu.modules.pad2d import Pad2D, PadMode
from puzzlelib_tpu.modules.penalty import Penalty, PenaltyMode
from puzzlelib_tpu.modules.prelu import PRelu
from puzzlelib_tpu.modules.replicate import Replicate
from puzzlelib_tpu.modules.reshape import Reshape
from puzzlelib_tpu.modules.rnn import RNN, RNNMode, DirectionMode, WeightModifier
from puzzlelib_tpu.modules.slice import Slice
from puzzlelib_tpu.modules.softmax import SoftMax
from puzzlelib_tpu.modules.spatialtf import SpatialTf
from puzzlelib_tpu.modules.split import Split
from puzzlelib_tpu.modules.subtractmean import SubtractMean
from puzzlelib_tpu.modules.sum import Sum
from puzzlelib_tpu.modules.swapaxes import SwapAxes
from puzzlelib_tpu.modules.tile import Tile
from puzzlelib_tpu.modules.tolist import ToList
from puzzlelib_tpu.modules.transpose import Transpose
from puzzlelib_tpu.modules.upsample2d import Upsample2D
from puzzlelib_tpu.modules.upsample3d import Upsample3D


def __getattr__(name):
    # lazy: switchmoe subclasses Container, and an eager import here would be
    # circular (containers.container imports modules.module, whose package
    # init is this file)
    if name in ("SwitchMoE", "MoEGate"):
        from puzzlelib_tpu.modules import switchmoe
        return getattr(switchmoe, name)

    raise AttributeError("module %r has no attribute %r" % (__name__, name))
