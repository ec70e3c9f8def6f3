"""Device/platform bootstrap for the JAX backend.

Plays the role of the reference's staged backend construction
(/root/reference/Cuda/GPUBackend.py:41-144) - except that XLA owns device
contexts, streams and memory pooling, so "init" reduces to choosing the
platform, pinning precision, and exposing shims for the CUDA-era objects
(memory pool, stream manager) that the public API still mentions.
"""

import os

from puzzlelib_tpu import config as Config

_initialized = False


def ensureInit():
    global _initialized

    if _initialized:
        return

    import jax

    if Config.backend == Config.Backend.cpu:
        # must override via config (not env): the axon TPU plugin's
        # sitecustomize forces jax_platforms="axon,cpu" at interpreter start
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already instantiated - respect it

    if Config.matmulPrecision:
        jax.config.update("jax_default_matmul_precision", Config.matmulPrecision)

    _initialized = True


def getDeviceName():
    import jax
    ensureInit()
    return jax.devices()[0].device_kind


def deviceCount():
    import jax
    ensureInit()
    return len(jax.devices())


class MemoryPool:
    """XLA owns allocation; this is an API-compatible no-op
    (reference pool: /root/reference/Cuda/Source/Core/Allocator.c)."""

    def freeHeld(self):
        pass

    def stopHolding(self):
        pass


class Stream:
    """XLA serializes work per device; synchronization is a no-op placeholder."""

    def synchronize(self):
        pass


class StreamManager:
    def __init__(self):
        self._pool = []

    def borrow(self, n):
        while len(self._pool) < n:
            self._pool.append(Stream())

        streams, self._pool = self._pool[:n], self._pool[n:]
        return streams

    def give(self, streams):
        self._pool.extend(streams)


memoryPool = MemoryPool()
streamManager = StreamManager()


def timeKernel(func, args=(), kwargs=None, looplength=1000, log=True, logname=None, normalize=False, hotpass=True):
    """Wall-clock timing of a callable with device sync, mirroring the
    reference's event-based ``timeKernel`` (/root/reference/Cuda/GPUBackend.py:332-368)."""
    import time
    import jax

    kwargs = {} if kwargs is None else kwargs

    def sync(result):
        # device->host read of one element: block_until_ready can return
        # before execution finishes on relayed PJRT backends, so the only
        # honest fence is a tiny data-dependent readback.  Readback failures
        # propagate — a silently-skipped fence would time nothing.
        import numpy as _np

        leaves = jax.tree.leaves(result, is_leaf=lambda x: hasattr(x, "jax"))
        for leaf in leaves:
            arr = leaf.jax if hasattr(leaf, "jax") else leaf
            if hasattr(arr, "ravel") and getattr(arr, "size", 0):
                _np.asarray(arr.ravel()[:1])
                return result

        jax.block_until_ready(result)
        return result

    if hotpass:
        sync(func(*args, **kwargs))

    start = time.perf_counter()

    for _ in range(looplength):
        result = func(*args, **kwargs)

    sync(result)
    secs = time.perf_counter() - start

    if normalize:
        secs /= looplength

    if log:
        logname = func.__name__ if logname is None else logname
        Config.getLogger().info("%s time: %s secs", logname, secs)

    return secs
