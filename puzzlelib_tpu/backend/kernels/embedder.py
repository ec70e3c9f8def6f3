"""Embedding dispatch (reference: /root/reference/Backend/Kernels/Embedder.py)."""

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import embed as _embed


def embed(data, W):
    return GPUArray(_embed.embed(data.jax, W.jax))


def embedBackwardParams(indata, grad, W, scale):
    """Scatter-add gradient into W's grad buffer in place (W here is the wgrad
    array, following the reference kernel's usage in Modules/Embedder.py)."""
    W._write(_embed.embedBackwardParams(indata.jax, grad.jax, W.jax, scale))
    return W
