"""Mat-vec kernel dispatch (reference: /root/reference/Backend/Kernels/MatVec.py)."""

from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import blas as _blas


def addVecToMat(vec, mat, axis=0, out=None):
    result = _blas.addVecToMat(vec.jax, mat.jax, axis)

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


def argmax(tensor, axis=0):
    return GPUArray(_blas.argmax(tensor.jax, axis))


addVecToMatBatch = addVecToMat
argmaxBatch = argmax
