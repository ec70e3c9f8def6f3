"""Global configuration flags.

TPU-native analogue of the reference's ``Config.py`` (/root/reference/Config.py:1-57):
a plain module of globals consulted lazily by the backend. Unlike the CUDA
reference (which binds a device context at import), JAX initializes lazily, so
flipping these before the first backend touch is enough.

Backends:
  * ``tpu``  - XLA on the default JAX platform (TPU when available).
  * ``cpu``  - force the JAX CPU platform; used as the numeric test oracle and
               for multi-device simulation via --xla_force_host_platform_device_count.
"""

import os
import sys
import logging
from enum import Enum


class ConfigError(Exception):
    pass


class Backend(Enum):
    tpu = 0
    cpu = 1


def _envBackend():
    name = os.environ.get("PUZZLE_BACKEND", "tpu").lower()
    try:
        return Backend[name]
    except KeyError:
        raise ConfigError("Unknown PUZZLE_BACKEND=%r (expected tpu|cpu)" % name)


backend = _envBackend()
deviceIdx = int(os.environ.get("PUZZLE_DEVICE_IDX", "0"))


allowMultiContext = False
systemLog = False
logger = None


libname = "puzzlelib_tpu"


globalEvalMode = False
disableDtypeShapeChecks = False
disableModuleCompatChecks = False
verifyData = False
showWarnings = True

# Matmul / conv precision for float32 inputs on TPU. "highest" gives full-f32
# accuracy (needed for 1e-5 parity with the numpy oracle); benchmarks may relax
# this to "default" (bf16x3 / bf16 passes) for speed.
matmulPrecision = os.environ.get("PUZZLE_MATMUL_PRECISION", "highest")

# NaN-poison fresh allocations (reference debug allocator, Cuda/Utils.py:97-114).
debugAllocator = False

# GEMM dispatch: "xla" (default), "pallas" (hand-tiled MXU kernel), or "auto"
# (pallas for large aligned shapes where the autotuner measured a win).
gemmAlgo = os.environ.get("PUZZLE_GEMM_ALGO", "xla")

# attention kernel: "auto" (measured per-signature dispatch - the Pallas
# online-softmax flash kernel where it measured faster, structurally for long
# bf16 sequences on TPU, XLA otherwise), "xla", or "flash" (force).
attentionAlgo = os.environ.get("PUZZLE_ATTENTION_ALGO", "auto")

# conv dispatch: "auto" (Pallas batch-in-lanes kernel for small-output-channel
# stride-1 bf16 convs - e.g. backward-data - where it measures ~4x over XLA's
# channels-last lowering; XLA otherwise), "xla", or "pallas" (force).
convAlgo = os.environ.get("PUZZLE_CONV_ALGO", "auto")

# Layout of conv weight state INSIDE the fused train step's carry: "hwio"
# keeps W / dW / momentum channels-last between steps so the weight update
# runs in the bwd-filter conv's natural CO-last layout (the boundary state
# and every user-visible buffer stay logical (co, c, *k)); "oihw" (default)
# disables the rewrite.  Numerically a pure permutation — validated by
# tests/test_training.py::testFusedHwioCarryMatchesLogical, and the full suite
# passes under either value.  On-chip A/B (2026-08-19, interleaved runs)
# measured a tie on VGG-16/ResNet-50 and a 10% LOSS on NIN, so it ships as an
# opt-in experiment; see docs/kernels.md "Whole-net wall analysis".
fusedConvLayout = os.environ.get("PUZZLE_FUSED_CONV_LAYOUT", "oihw")


def isCPUBased(bnd):
    return bnd == Backend.cpu


def shouldInit():
    return True


def getLogger():
    global logger

    if logger is not None:
        return logger

    logger = logging.getLogger(libname)
    logger.setLevel(logging.DEBUG if systemLog else logging.INFO)

    handler = logging.StreamHandler(stream=sys.stdout)
    handler.setFormatter(logging.Formatter("[%(name)s] %(message)s"))

    logger.addHandler(handler)
    return logger
