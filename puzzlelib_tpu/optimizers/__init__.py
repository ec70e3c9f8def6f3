"""Optimizer exports (parity with /root/reference/Optimizers/__init__.py)."""

from puzzlelib_tpu.optimizers.adadelta import AdaDelta
from puzzlelib_tpu.optimizers.adagrad import AdaGrad
from puzzlelib_tpu.optimizers.adam import Adam
from puzzlelib_tpu.optimizers.momentumsgd import MomentumSGD
from puzzlelib_tpu.optimizers.nesterovsgd import NesterovSGD
from puzzlelib_tpu.optimizers.rmsprop import RMSProp
from puzzlelib_tpu.optimizers.rmspropgraves import RMSPropGraves
from puzzlelib_tpu.optimizers.sgd import SGD
from puzzlelib_tpu.optimizers.smorms3 import SMORMS3
from puzzlelib_tpu.optimizers.optimizer import Optimizer
from puzzlelib_tpu.optimizers.hooks import Hook, WeightDecay, GradClip
