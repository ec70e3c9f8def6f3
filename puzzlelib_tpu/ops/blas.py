"""GEMM-family primitives on the MXU.

Contracts mirror the reference BLAS surface (/root/reference/Backend/Blas.py,
cuBLAS binding /root/reference/Cuda/Source/Libs/CuBlas.c:486-494): plain gemm
with alpha/beta accumulation, grouped batched gemm with "gbp" (group-major) and
"bgp" (batch-major) layouts, dot, and L1 norm.  All contractions request
float32 accumulation so bf16/fp16 inputs still accumulate on the MXU at full
precision.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("transpA", "transpB", "hasOut"))
def gemm(A, B, C, alpha, beta, transpA=False, transpB=False, hasOut=False):
    a = A.T if transpA else A
    b = B.T if transpB else B

    out = jnp.dot(a, b, preferred_element_type=jnp.float32)
    out = jnp.asarray(alpha, out.dtype) * out

    if hasOut:
        out = out + jnp.asarray(beta, out.dtype) * C.astype(out.dtype)

    return out.astype(A.dtype)


def _toGroupMajor(T, fmt):
    # gbp: (groups, rows, cols); bgp: (rows, groups, cols) -> group-major
    return T if fmt == "gbp" else jnp.swapaxes(T, 0, 1)


def _fromGroupMajor(T, fmt):
    return T if fmt == "gbp" else jnp.swapaxes(T, 0, 1)


@partial(jax.jit, static_argnames=("formatA", "formatB", "formatOut", "transpA", "transpB", "hasOut"))
def gemmBatched(A, B, C, alpha, beta, formatA="bgp", formatB="bgp", formatOut="bgp",
                transpA=False, transpB=False, hasOut=False):
    a = _toGroupMajor(A, formatA)
    b = _toGroupMajor(B, formatB)

    if transpA:
        a = jnp.swapaxes(a, 1, 2)
    if transpB:
        b = jnp.swapaxes(b, 1, 2)

    out = jax.lax.dot_general(
        a, b, dimension_numbers=(((2, ), (1, )), ((0, ), (0, ))), preferred_element_type=jnp.float32
    )
    out = jnp.asarray(alpha, out.dtype) * out

    if hasOut:
        out = out + jnp.asarray(beta, out.dtype) * _toGroupMajor(C, formatOut).astype(out.dtype)

    return _fromGroupMajor(out, formatOut).astype(A.dtype)


@jax.jit
def dot(x, y):
    return jnp.dot(x.ravel(), y.ravel(), preferred_element_type=jnp.float32).astype(x.dtype)


@jax.jit
def l1norm(x):
    return jnp.sum(jnp.abs(x)).astype(x.dtype)


@partial(jax.jit, static_argnames=("axis", "hasOut"))
def matsum(A, axis, out, alpha, beta, hasOut=False):
    """Sum of a tensor along one axis with alpha/beta accumulation
    (reference matsum: /root/reference/Cuda/Kernels/MatVec.py:273)."""
    s = jnp.sum(A.astype(jnp.float32), axis=axis)
    s = jnp.asarray(alpha, s.dtype) * s

    if hasOut:
        s = s + jnp.asarray(beta, s.dtype) * out.astype(s.dtype)

    return s.astype(A.dtype)


@partial(jax.jit, static_argnames=("axis", "hasOut"))
def matvec(T, v, axis, out, alpha, beta, hasOut=False):
    """Grouped matrix-vector product (reference /root/reference/Cuda/Kernels/MatVec.py:311):
    T is (groups, m, n) group-major; v is (groups, n) [axis=1] or (groups, m) [axis=0,
    i.e. transposed product]."""
    if axis == 1:
        s = jnp.einsum("gmn,gn->gm", T.astype(jnp.float32), v.astype(jnp.float32))
    else:
        s = jnp.einsum("gmn,gm->gn", T.astype(jnp.float32), v.astype(jnp.float32))

    s = jnp.asarray(alpha, s.dtype) * s

    if hasOut:
        s = s + jnp.asarray(beta, s.dtype) * out.astype(s.dtype)

    return s.astype(T.dtype)


@partial(jax.jit, static_argnames=("axis", ))
def addVecToMat(v, m, axis):
    """m + v broadcast along ``axis`` (axis=1: v indexed by column; axis=0: by row).
    Reference: /root/reference/Cuda/Kernels/MatVec.py:346."""
    if axis == 1:
        return m + v.reshape((1, ) * (m.ndim - 1) + (v.size, )).astype(m.dtype)

    return m + v.reshape((v.size, ) + (1, ) * (m.ndim - 1)).astype(m.dtype)


@partial(jax.jit, static_argnames=("axis", ))
def argmax(x, axis):
    return jnp.argmax(x, axis=axis).astype(jnp.int32)
