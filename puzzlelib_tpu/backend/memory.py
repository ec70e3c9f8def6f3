"""Memory/layout dispatch (reference: /root/reference/Backend/Memory.py).

``depthConcat``/``depthSplit`` implement the Inception-style concat of tensors
with differing spatial sizes, centered on the max extent (reference kernel:
/root/reference/Cuda/Kernels/Memory.py:162).
"""

import numpy as np
import jax.numpy as jnp

from puzzlelib_tpu.tensor import GPUArray


def moveaxis(data, src, dst):
    return GPUArray(jnp.moveaxis(data.jax, src, dst))


def swapaxes(data, axis1, axis2):
    return GPUArray(jnp.swapaxes(data.jax, axis1, axis2))


def transpose(data, axes):
    return GPUArray(jnp.transpose(data.jax, tuple(axes)))


def depthConcat(tensors):
    assert all(t.ndim == 4 for t in tensors)

    batch = tensors[0].shape[0]
    h = max(t.shape[2] for t in tensors)
    w = max(t.shape[3] for t in tensors)

    parts = []
    for t in tensors:
        th, tw = t.shape[2], t.shape[3]
        top, left = (h - th) // 2, (w - tw) // 2

        parts.append(jnp.pad(t.jax, ((0, 0), (0, 0), (top, h - th - top), (left, w - tw - left))))

    return GPUArray(jnp.concatenate(parts, axis=1))


def depthSplit(grad, tensors):
    h, w = grad.shape[2], grad.shape[3]

    grads, offset = [], 0
    for t in tensors:
        c, th, tw = t.shape[1], t.shape[2], t.shape[3]
        top, left = (h - th) // 2, (w - tw) // 2

        grads.append(GPUArray(grad.jax[:, offset:offset + c, top:top + th, left:left + tw]))
        offset += c

    return grads
