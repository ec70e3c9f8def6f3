"""Mutable RNG facade over ``jax.random``.

The reference exposes a stateful device RNG (cuRAND XORWOW,
/root/reference/Cuda/Source/Libs/CuRand.c) with ``fillUniform``/``fillNormal``
writing into existing arrays.  Here a splittable JAX key is advanced behind a
mutable handle; fills rebind the target GPUArray's buffer.
"""

import numpy as np
import jax
import jax.numpy as jnp


class RandomNumberGenerator:
    def __init__(self, seed=None):
        if seed is None:
            seed = int(np.random.SeedSequence().entropy % (2 ** 63))

        self.seed(seed)

    def seed(self, seed):
        # key creation is deferred so importing this module never touches a device
        self._seed, self._key = seed, None

    def nextKey(self):
        from puzzlelib_tpu import fusedctx

        if fusedctx.active():
            return fusedctx.nextKey()

        if self._key is None:
            self._key = jax.random.key(self._seed)

        self._key, sub = jax.random.split(self._key)
        return sub

    def fillUniform(self, data, minval=0.0, maxval=1.0):
        dtype = data.dtype if data.dtype.kind == "f" else np.float32
        sample = jax.random.uniform(self.nextKey(), data.shape, dtype, minval, maxval)
        data._write(sample.astype(data.dtype))

    def fillNormal(self, data, mean=0.0, sigma=1.0):
        dtype = data.dtype if data.dtype.kind == "f" else np.float32
        sample = jax.random.normal(self.nextKey(), data.shape, dtype) * sigma + mean
        data._write(sample.astype(data.dtype))

    def fillInteger(self, data):
        if data.dtype.kind == "u":
            sample = jax.random.bits(self.nextKey(), data.shape, dtype=np.dtype(data.dtype))
        else:
            info = np.iinfo(data.dtype)
            sample = jax.random.randint(self.nextKey(), data.shape, info.min, info.max,
                                        dtype=np.dtype(data.dtype))

        data._write(sample)


globalRng = RandomNumberGenerator()
