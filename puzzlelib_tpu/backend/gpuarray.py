"""Backend-neutral array namespace (reference: /root/reference/Backend/gpuarray.py).

Unlike the reference, there is a single JAX-backed implementation; ``autoinit``
only selects the platform (tpu vs cpu-oracle) and binds the public slots.
"""

import numpy as np
import jax.numpy as jnp

from puzzlelib_tpu import config as Config
from puzzlelib_tpu import tensor as _tensor
from puzzlelib_tpu import rng as _rng
from puzzlelib_tpu.backend import device as _device


GPUArray = None
to_gpu = None
empty = None
zeros = None

minimum = None
maximum = None

getDeviceName = None
SharedArray = None
memoryPool = None

streamManager = None
globalRng = None

copy = None
concatenate = None
split = None
tile = None

fillUniform = None
fillNormal = None

setupDebugAllocator = None
dtypesSupported = None
timeKernel = None


def autoinit():
    if not Config.shouldInit():
        return

    _device.ensureInit()

    global GPUArray, to_gpu, empty, zeros, minimum, maximum
    GPUArray = _tensor.GPUArray
    to_gpu = _tensor.GPUArray.toGpu
    empty = _tensor.GPUArray.empty
    zeros = _tensor.GPUArray.zeros
    minimum = _tensor.GPUArray.min
    maximum = _tensor.GPUArray.max

    global getDeviceName, SharedArray, memoryPool, streamManager, globalRng
    getDeviceName = _device.getDeviceName
    SharedArray = _tensor.SharedArray
    memoryPool = _device.memoryPool
    streamManager = _device.streamManager
    globalRng = _rng.globalRng

    global copy, concatenate, split, tile
    copy = _copy
    concatenate = _concatenate
    split = _split
    tile = _tile

    global fillUniform, fillNormal
    fillUniform = _fillUniform
    fillNormal = _fillNormal

    global setupDebugAllocator, dtypesSupported, timeKernel
    setupDebugAllocator = _setupDebugAllocator
    dtypesSupported = _tensor.dtypesSupported
    timeKernel = _device.timeKernel


def _copy(dest, source):
    if dest is None:
        return _tensor.GPUArray(source.jax)

    dest.set(source)
    return dest


def _concatenate(tup, axis, out=None):
    result = jnp.concatenate([ary.jax for ary in tup], axis=axis)

    if out is None:
        return _tensor.GPUArray(result)

    out._write(result)
    return out


def _split(ary, sections, axis):
    bounds = np.cumsum(sections)[:-1].tolist()
    return [_tensor.GPUArray(part) for part in jnp.split(ary.jax, bounds, axis=axis)]


def _tile(ary, times, axis):
    reps = [1] * ary.ndim
    reps[axis] = times
    return _tensor.GPUArray(jnp.tile(ary.jax, reps))


def _fillUniform(data, minval=0.0, maxval=1.0, rng=None):
    (rng if rng is not None else _rng.globalRng).fillUniform(data, minval, maxval)


def _fillNormal(data, mean=0.0, stddev=1.0, rng=None):
    (rng if rng is not None else _rng.globalRng).fillNormal(data, mean, stddev)


def _setupDebugAllocator():
    Config.debugAllocator = True


autoinit()
