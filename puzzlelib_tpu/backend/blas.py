"""BLAS dispatch (reference: /root/reference/Backend/Blas.py)."""

from puzzlelib_tpu import config as Config
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.ops import blas as _ops


toVectorAddVector = None
addVectorToVector = None
dot = None
vectorL1Norm = None

mulMatrixOnMatrix = None
sumOnMatrix = None

mulTensorOnVecGroup = None
sumOnTensorGroup = None
mulTensorBatch = None


def autoinit():
    if not Config.shouldInit():
        return

    global toVectorAddVector, addVectorToVector, dot, vectorL1Norm
    toVectorAddVector = _toVectorAddVector
    addVectorToVector = _addVectorToVector
    dot = _dot
    vectorL1Norm = _vectorL1Norm

    global mulMatrixOnMatrix, sumOnMatrix
    mulMatrixOnMatrix = _mulMatrixOnMatrix
    sumOnMatrix = _sumOnMatrix

    global mulTensorOnVecGroup, sumOnTensorGroup, mulTensorBatch
    mulTensorOnVecGroup = _mulTensorOnVecGroup
    sumOnTensorGroup = _sumOnTensorGroup
    mulTensorBatch = _mulTensorBatch


def _toVectorAddVector(y, x, alpha=1.0):
    from puzzlelib_tpu.ops import elementwise as _ew
    y._write(_ew.toVectorAddVector(y.jax, x.jax, alpha))
    return y


def _addVectorToVector(x, y, out=None, alpha=1.0, beta=1.0):
    result = x.jax * alpha + y.jax * beta

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


def _dot(x, y):
    return GPUArray(_ops.dot(x.jax, y.jax))


def _vectorL1Norm(x):
    return GPUArray(_ops.l1norm(x.jax))


_pallasGemmBroken = False


def _pallasGemmTiles(A, B):
    """None to use the XLA dot, else (bm, bn, bk) tiles for the Pallas kernel."""
    if Config.gemmAlgo == "xla" or _pallasGemmBroken or B.ndim != 2:
        return None

    # GSPMD mesh tracing: an opaque pallas_call can't be sharded by the
    # partitioner - same gate the conv paths honor (ops.conv.disablePallas)
    from puzzlelib_tpu.ops import conv as _opsconv
    if _opsconv._pallasDisabled:
        return None

    from puzzlelib_tpu.ops.pallas import matmul as _plmm

    m, k = A.shape
    n = B.shape[1]

    if Config.gemmAlgo == "pallas":
        return _plmm._tuned.get((m, n, k, A.dtype.str), (512, 512, 512))

    # "auto": a measured per-shape decision when the autotuner has seen this
    # shape (Linear.optimizeForShape / gemmspeed --tune fill the table) ...
    key = _plmm.dispatchKey(m, n, k, A.dtype)
    if key in _plmm._dispatch:
        return _plmm._dispatch[key]

    # ... else the static prior: large, lane-aligned shapes measured at parity
    # with XLA, so only route clearly-MXU-saturating shapes
    if min(m, k, n) >= 1024 and n % 128 == 0 and k % 128 == 0:
        return (512, 512, 512)

    return None


def _mulMatrixOnMatrix(A, B, out=None, transpA=False, transpB=False, alpha=1.0, beta=0.0):
    hasOut = out is not None and beta != 0.0

    tiles = None
    if not transpA and not transpB and not hasOut and alpha == 1.0:
        tiles = _pallasGemmTiles(A, B)

    if tiles is not None:
        from puzzlelib_tpu.ops.pallas import matmul as _plmm, onTpu

        bm, bn, bk = tiles
        try:
            result = _plmm.matmulPadded(A.jax, B.jax, bm=bm, bn=bn, bk=bk,
                                        interpret=not onTpu())
        except Exception:
            # pallas compile failure (e.g. flaky remote-compile service): fall
            # back to the XLA dot, and remember so every later gemm skips the
            # failed-compile latency instead of re-paying it per call
            global _pallasGemmBroken
            _pallasGemmBroken = True
            import logging
            logging.getLogger("puzzlelib_tpu").warning(
                "Pallas GEMM kernel failed to compile; all GEMMs run on the "
                "XLA dot for the rest of the process "
                "(ops.conv.resetDispatchCaches() to re-probe)")
            result = None

        if result is not None:
            if out is None:
                return GPUArray(result)

            out._write(result)
            return out

    result = _ops.gemm(A.jax, B.jax, out.jax if hasOut else None, alpha, beta,
                       transpA=transpA, transpB=transpB, hasOut=hasOut)

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


def _sumOnMatrix(A, out=None, cols=True, alpha=1.0, beta=0.0):
    assert A.ndim == 2
    hasOut = out is not None and beta != 0.0

    result = _ops.matsum(A.jax, 0 if cols else 1, out.jax if hasOut else None, alpha, beta, hasOut=hasOut)

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


def _mulTensorOnVecGroup(tensor, vecs, out=None, formatT="bgp", transpT=False, alpha=1.0, beta=0.0):
    assert tensor.ndim == 3 and formatT == "gbp"
    axis = 0 if transpT else 1
    hasOut = out is not None and beta != 0.0

    result = _ops.matvec(tensor.jax, vecs.jax, axis, out.jax if hasOut else None, alpha, beta, hasOut=hasOut)

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


def _sumOnTensorGroup(tensor, out=None, formatT="bgp", cols=True, alpha=1.0, beta=0.0):
    assert tensor.ndim == 3
    axis = (1 if formatT == "gbp" else 0) if cols else 2
    hasOut = out is not None and beta != 0.0

    result = _ops.matsum(tensor.jax, axis, out.jax if hasOut else None, alpha, beta, hasOut=hasOut)

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


def _mulTensorBatch(A, B, formatA="bgp", formatB="bgp", out=None, formatOut="bgp",
                    transpA=False, transpB=False, alpha=1.0, beta=0.0):
    hasOut = out is not None and beta != 0.0

    result = _ops.gemmBatched(
        A.jax, B.jax, out.jax if hasOut else None, alpha, beta,
        formatA=formatA, formatB=formatB, formatOut=formatOut,
        transpA=transpA, transpB=transpB, hasOut=hasOut
    )

    if out is None:
        return GPUArray(result)

    out._write(result)
    return out


autoinit()
