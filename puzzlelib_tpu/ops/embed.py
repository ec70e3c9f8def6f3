"""Embedding gather + scatter-add backward
(reference kernels: /root/reference/Cuda/Kernels/Embedder.py:45; negative
indices are treated as padding and contribute nothing)."""

import jax
import jax.numpy as jnp


@jax.jit
def embed(indices, W):
    safe = jnp.maximum(indices, 0)
    out = jnp.take(W, safe, axis=0)
    mask = (indices >= 0).astype(W.dtype)[..., None]
    return out * mask


@jax.jit
def embedBackwardParams(indices, grad, wgrad, scale):
    safe = jnp.maximum(indices, 0)
    mask = (indices >= 0).astype(grad.dtype)[..., None]
    contrib = (grad * mask).reshape(-1, grad.shape[-1]) * jnp.asarray(scale, grad.dtype)

    return wgrad.at[safe.ravel()].add(contrib)
