"""Softmax over the channel axis (cuDNN "spatial"/per-channel-position mode,
/root/reference/Cuda/Source/Libs/CuDnn.c softmaxNd) with derivative-from-output.
"""

import jax
import jax.numpy as jnp


@jax.jit
def softmaxNd(x):
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=1, keepdims=True)
    e = jnp.exp(xf - m)
    return (e / jnp.sum(e, axis=1, keepdims=True)).astype(x.dtype)


@jax.jit
def softmaxNdBackward(out, grad):
    of, gf = out.astype(jnp.float32), grad.astype(jnp.float32)
    return (of * (gf - jnp.sum(gf * of, axis=1, keepdims=True))).astype(out.dtype)
