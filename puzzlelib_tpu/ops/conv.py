"""N-dimensional convolution / deconvolution in NCHW layout.

Replaces the cuDNN binding (/root/reference/Cuda/Source/Libs/CuDnn.c:1155-1220)
with ``lax.conv_general_dilated``.  The backward passes are written as explicit
convolutions rather than ``jax.vjp`` of the forward:

- bwd-filter is itself a convolution with the batch and feature roles swapped
  (activations convolved with the output gradient as the kernel) - one fused
  MXU pass, no HBM-materialised im2col;
- bwd-data is the direct transposed conv (input-dilated conv with the
  spatially-reversed, IO-swapped kernel).

Both avoid XLA's conv-transpose rewrites (batch_group_count and friends),
which the axon remote compiler handles pathologically slowly for some shapes
(single-channel bwd-filter was observed to hang for minutes), and they map
exactly onto the implicit-GEMM structure the Pallas kernels use.

Layout policy: the public API is NCHW (reference parity), but on accelerator
platforms low-precision convs are routed through channels-last (NHWC) specs -
XLA's TPU lowering of NCHW bf16 convs is an order of magnitude slower, while
the explicit transposes are cheap, visible to XLA, and cancel between adjacent
convs inside a fused train step.

Algo selection (``ConvFwdAlgo`` etc.) is retained as an API-level no-op: XLA
owns scheduling, and `optimizeForShape` maps to ahead-of-time compilation.
"""

import logging
import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

logger = logging.getLogger("puzzlelib_tpu")


def _dimNumbers(nd):
    spatial = "DHW"[3 - nd:]
    return ("NC" + spatial, "OI" + spatial, "NC" + spatial)


def _channelsLastNumbers(nd):
    spatial = "DHW"[3 - nd:]
    return ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")


def _useChannelsLast(dtype):
    # sub-f32 NCHW convs hit XLA TPU's slow path; reroute through NHWC
    return jnp.dtype(dtype).itemsize < 4 and jax.default_backend() != "cpu"


_pallasFailed = set()

# trace-time dispatch tally: lets benchmarks assert the Pallas path actually
# ran (a silent XLA fallback would otherwise masquerade as a Pallas number)
dispatchStats = {"winograd": 0, "xla": 0,
                 "winogradFG": 0, "xlaFG": 0}


def resetDispatchCaches():
    """Forget negative dispatch decisions (failed Pallas probes/compiles).

    The per-process caches exist so one flaky remote compile doesn't re-pay
    its latency on every call - but they also pin the slower XLA path for the
    process lifetime.  Call this (e.g. alongside flipping ``Config.convAlgo``)
    to re-probe."""
    from puzzlelib_tpu.backend import blas as Blas

    from puzzlelib_tpu.ops.pallas import winograd as pwino

    _pallasFailed.clear()
    pwino._probeResults.clear()
    Blas._pallasGemmBroken = False


# measured per-shape algo choices, recorded by Dnn.convNdbenchmark (i.e.
# Module.optimizeForShape) under the honest equal-harness comparison; keys
# ("fwd"|"fg", shapes...) -> "xla" | "winograd".  The cuDNN-algo-search
# ledger of this backend (/root/reference/Cuda/GPUBackend.py:371).
_algoChoice = {}

_pallasDisabled = 0


class disablePallas:
    """Context: force the XLA paths while tracing.  Used by the GSPMD mesh
    train step - the SPMD partitioner cannot shard an opaque ``pallas_call``
    and would replicate its operands across the mesh instead."""

    def __enter__(self):
        global _pallasDisabled
        _pallasDisabled += 1

    def __exit__(self, *exc):
        global _pallasDisabled
        _pallasDisabled -= 1


def _pallasGateKey(jitted):
    """Make the ``disablePallas`` state part of a jitted op's cache key.

    Dispatch reads module globals at trace time, which the jit caches never
    see - including the tracing cache consulted when the op is invoked under
    an OUTER trace, which ``Function.clear_cache`` does not touch.  Without
    the key a signature traced on one side of the gate is replayed verbatim
    on the other: a pallas_call smuggled into a mesh trace, or an XLA-only
    jaxpr pinned onto the eager fast path.  The wrapped function must accept
    a static ``xlaOnly`` keyword (unused in the body; the globals still make
    the decision - this only splits the cache entries)."""
    @functools.wraps(jitted)
    def wrapper(*args, **kw):
        return jitted(*args, xlaOnly=bool(_pallasDisabled), **kw)

    wrapper.clear_cache = jitted.clear_cache
    return wrapper


def _tryWinograd(x, w, stride, pad, dilation, groups):
    """Fused Winograd F(2x2,3x3) for 3x3 stride-1 bf16 convs - dispatched
    only where the measured comparison says it beats XLA's NHWC conv
    (honest marginals put XLA at 75-94% of the roofline on ResNet/VGG
    body shapes, so Winograd's 2.25x FLOP cut usually only ties; ties go
    to XLA).  ``Config.convAlgo = "winograd"`` forces it.  The cuDNN algo
    family's WINOGRAD member (/root/reference/Cuda/Source/Libs/CuDnn.c:
    1155-1220).  Returns None when not applicable/not chosen."""
    from puzzlelib_tpu import config as Config

    algo = getattr(Config, "convAlgo", "auto")
    if algo == "xla" or _pallasDisabled or jax.default_backend() == "cpu":
        return None

    if x.dtype != jnp.bfloat16 or w.dtype != jnp.bfloat16:
        return None

    if algo != "winograd":
        choice = _algoChoice.get(("fwd", x.shape, w.shape, tuple(pad)))
        if choice != "winograd":
            return None

    from puzzlelib_tpu.ops.pallas import winograd as pwino

    if not pwino.applicable(x.shape, w.shape, stride, pad, dilation, groups,
                            x.dtype):
        return None

    key = ("wino", x.shape, w.shape, tuple(pad), str(x.dtype))
    if key in _pallasFailed:
        return None

    if not pwino.probeCompile(x.shape, w.shape, tuple(pad), x.dtype):
        _pallasFailed.add(key)
        logger.warning(
            "Winograd conv probe-compile failed for x%s w%s %s; this shape "
            "runs on the XLA fallback for the rest of the process "
            "(ops.conv.resetDispatchCaches() to re-probe)",
            x.shape, w.shape, x.dtype)
        return None

    try:
        return pwino.conv2d(x, w, tuple(pad))
    except Exception:
        _pallasFailed.add(key)
        logger.warning(
            "Winograd conv kernel failed at trace time for x%s w%s %s; "
            "falling back to XLA for this shape", x.shape, w.shape, x.dtype)
        return None


# The batch-in-lanes HCWN kernel (ops/pallas/conv.py) and the kw-stacked
# conv3 kernel were REMOVED 2026-08-19 after the corrected-methodology sweep
# (tools/convsweep.py, results in tools/convsweep_results.txt): XLA's NHWC
# conv beat both at every one of 14 swept signatures INCLUDING their design
# points (HCWN at the reference ConvSpeed shape 128x32x64x64 ⊛ 11x11:
# XLA 0.987 ms vs 1.158; conv3 at train-batch body shapes: 2-10x behind).
# Earn-or-trim: a kernel the measured dispatch never selects is inventory,
# not capability.  The Winograd family below remains the structural
# alternative for 3x3 stride-1 convs.


def measureAlgoChoice(datashape, Wshape, stride, pad, dilation, groups,
                      dtype=jnp.bfloat16, reps=10, k=3):
    """Time the candidate conv algorithms for this signature with
    equal-harness chains (array-delta perturbations, min of ``k`` fenced
    calls) and record the winners in ``_algoChoice``; ties go to XLA.
    Candidates per direction:

      fwd        XLA NHWC direct | fused Winograd F(2x2,3x3)
      bwd-data   the same candidates on the rotated-filter forward signature
      bwd-filter XLA batch-role-swap | transform-domain Winograd dU (3x3)

    Called from ``Dnn.convNdbenchmark`` so ``Module.optimizeForShape``
    persists measured dispatch, the cuDNN-algo-search equivalent
    (/root/reference/Cuda/GPUBackend.py:371)."""
    import time
    from puzzlelib_tpu.backend.device import ensureInit
    from puzzlelib_tpu.ops.pallas import winograd as pwino

    ensureInit()     # resolve the platform override before touching backends

    if jax.default_backend() == "cpu":
        return None

    stride, pad, dilation = tuple(stride), tuple(pad), tuple(dilation)

    if len(datashape) != 4:
        return None

    n, c, h, wd = datashape
    co, kh, kw = Wshape[0], Wshape[2], Wshape[3]
    oh = (h + 2 * pad[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    ow = (wd + 2 * pad[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1

    key = jax.random.key(0)

    def minTime(f, args):
        jax.block_until_ready(f(*args))
        np.asarray(f(*args).ravel()[:1])
        best = float("inf")
        for _ in range(k):
            t = time.perf_counter()
            np.asarray(f(*args).ravel()[:1])
            best = min(best, time.perf_counter() - t)
        return best

    def chain(fn):
        # lax.scan keeps the program O(1)-sized (the remote compiler rejects
        # long unrolled chains) and cross-rep CSE impossible
        @jax.jit
        def chained(*args):
            def body(acc, i):
                return acc + jnp.max(fn(i, *args).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(reps))
            return acc
        return chained

    def compareFwd(xN, wsh, pd, tag):
        """Race every applicable kernel on conv(x ⊛ w, pad=pd), x NHWC;
        record the winner under this signature's dispatch key."""
        nn, hh, ww, cc = xN.shape
        dsh = (nn, cc, hh, ww)
        wsh, pd = tuple(wsh), tuple(pd)
        wz = jnp.zeros(wsh, dtype)
        dl = (jax.random.normal(key, (reps, ) + wsh, jnp.float32)
              * 0.01).astype(dtype)

        def xlaF(i, x, w, d):
            out = lax.conv_general_dilated(
                x, (w + d[i]).transpose(2, 3, 1, 0), stride,
                [(p, p) for p in pd],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype)

        entries = [("xla", xlaF, (xN, wz, dl))]

        if pwino.applicable(dsh, wsh, stride, pd, dilation, groups, dtype):
            entries.append((
                "winograd",
                lambda i, x, w, d: pwino.conv2dNHWC(x, w + d[i], pd),
                (xN, wz, dl)))

        if len(entries) == 1:
            return None

        times = {}
        for name, fn, args in entries:
            try:
                times[name] = minTime(chain(fn), args)
            except Exception:
                logger.warning("%s %s comparison failed for %s; dropping "
                               "the candidate", tag, name, (dsh, wsh))

        tx = times.get("xla")
        if tx is None or len(times) == 1:
            return None

        best = min(times, key=times.get)
        choice = best if times[best] < tx * 0.97 else "xla"   # ties go to XLA
        _algoChoice[("fwd", dsh, wsh, pd)] = choice
        return (choice, ) + tuple(sorted(
            (nm, t / reps) for nm, t in times.items()))

    results = {}

    x = (jax.random.normal(key, (n, h, wd, c), jnp.float32) * 0.3).astype(dtype)
    r = compareFwd(x, Wshape, pad, "fwd")
    if r is not None:
        results["fwd"] = r

    dy = (jax.random.normal(key, (n, oh, ow, co), jnp.float32) * 0.1).astype(dtype)
    dyRows = min(8, oh)

    if pwino.filterGradApplicable(datashape, (n, co, oh, ow), stride, pad,
                                  dilation, groups, dtype) \
            and pwino.probeCompileFG(datashape, (n, co, oh, ow), pad, dtype):
        dyDeltas = (jax.random.normal(key, (reps, n, dyRows, ow, co),
                                      jnp.float32) * 0.01).astype(dtype)

        def xlaFG(i, x, dy, dyDeltas):
            dyp = dy.at[:, :dyRows].add(dyDeltas[i])
            xb = jnp.transpose(x, (0, 3, 1, 2))
            dyb = jnp.transpose(dyp, (0, 3, 1, 2))
            return _filterGradDenseNhwc(xb, dyb, (3, 3), stride, pad, dilation)

        def winoFG(i, x, dy, dyDeltas):
            return pwino.filterGradNHWC(x, dy.at[:, :dyRows].add(dyDeltas[i]),
                                        pad)

        try:
            tx = minTime(chain(xlaFG), (x, dy, dyDeltas))
            tw = minTime(chain(winoFG), (x, dy, dyDeltas))
            choice = "winograd" if tw < tx * 0.97 else "xla"
            _algoChoice[("fg", tuple(datashape), (n, co, oh, ow), pad)] = choice
            results["fg"] = (choice, tx / reps, tw / reps)
        except Exception:
            logger.warning("winograd bwd-filter comparison failed for %s; "
                           "keeping XLA", (datashape, Wshape))

    # bwd-data reaches _convCore as a rotated-filter conv with its OWN fwd
    # signature (dY ⊛ W^T_rot at pad k-1-p) - measure and record that key too
    bwdPad = (dilation[0] * (kh - 1) - pad[0], dilation[1] * (kw - 1) - pad[1])

    if stride == (1, 1) and min(bwdPad) >= 0:
        r = compareFwd(dy, (c, co, kh, kw), bwdPad, "bwdData")
        if r is not None:
            results["bwdData"] = r

    # dispatch reads _algoChoice at trace time: any jit that already traced
    # this signature would keep its pre-measurement choice forever (same
    # hazard the GEMM tile autotuner clears, pallas/matmul.py autotune)
    if results:
        for fn in (convNd, convNdBackwardData, convNdBackwardParams,
                   deconvNd, deconvNdBackwardData):
            try:
                fn.clear_cache()
            except Exception:
                pass

    return results


def _toNhwc(x):
    nd = x.ndim - 2
    return jnp.transpose(x, (0, ) + tuple(range(2, 2 + nd)) + (1, ))


def _fromNhwc(x):
    nd = x.ndim - 2
    return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, 1 + nd)))


def _convCore(x, w, stride, pad, dilation, groups):
    nd = x.ndim - 2

    if nd == 2:
        out = _tryWinograd(x, w, stride, pad, dilation, groups)

        if out is not None:
            dispatchStats["winograd"] += 1
            return out

    dispatchStats["xla"] += 1

    if _useChannelsLast(x.dtype):
        out = lax.conv_general_dilated(
            _toNhwc(x), jnp.transpose(w, tuple(range(2, 2 + nd)) + (1, 0)),
            window_strides=stride,
            padding=[(p, p) for p in pad],
            rhs_dilation=dilation,
            dimension_numbers=_channelsLastNumbers(nd),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        )
        return _fromNhwc(out).astype(x.dtype)

    return lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(p, p) for p in pad],
        rhs_dilation=dilation,
        dimension_numbers=_dimNumbers(nd),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@_pallasGateKey
@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups", "hasBias", "xlaOnly"))
def convNd(x, w, b, stride, pad, dilation, groups, hasBias=False, xlaOnly=False):
    out = _convCore(x, w, stride, pad, dilation, groups)

    if hasBias:
        out = out + b.reshape((1, b.size) + (1, ) * (x.ndim - 2)).astype(out.dtype)

    return out


# -- bwd-filter: a convolution with batch and feature roles swapped ------------

def _filterGradPadding(x, grad, size, stride, pad, dilation):
    """High padding trimmed so the "output" spatial dims of the
    batch-role-swapped conv land exactly on the filter size (recovers pixels
    lost to the forward conv's stride flooring)."""
    nd = x.ndim - 2

    return tuple(
        (pad[i],
         dilation[i] * (size[i] - 1) + stride[i] * (grad.shape[2 + i] - 1) + 1
         - x.shape[2 + i] - pad[i])
        for i in range(nd)
    )


def _filterGradDense(x, grad, size, stride, pad, dilation):
    """dW (outmaps, inmaps, *size): convolve x (batch role -> channels) with
    grad as the kernel (contraction over the true batch), one fused conv.

    Window strides take the forward dilation, rhs dilation takes the forward
    stride; see ``_filterGradPadding`` for the trim.
    """
    nd = x.ndim - 2
    spatial = "DHW"[3 - nd:]

    padding = _filterGradPadding(x, grad, size, stride, pad, dilation)

    out = lax.conv_general_dilated(
        x, grad,
        window_strides=dilation,
        padding=padding,
        rhs_dilation=stride,
        dimension_numbers=("CN" + spatial, "IO" + spatial, "NC" + spatial),
        preferred_element_type=jnp.float32,
    )                                            # (inmaps, outmaps, *size)
    return jnp.swapaxes(out, 0, 1)


def _filterGradDenseNhwc(x, grad, size, stride, pad, dilation):
    """Channels-last variant of ``_filterGradDense`` for sub-f32 dtypes."""
    nd = x.ndim - 2
    spatial = "DHW"[3 - nd:]

    padding = _filterGradPadding(x, grad, size, stride, pad, dilation)

    xl = jnp.transpose(x, (1, ) + tuple(range(2, 2 + nd)) + (0, ))      # (C, *sp, N)
    gl = jnp.transpose(grad, tuple(range(2, 2 + nd)) + (0, 1))          # (*sp, N, CO)

    out = lax.conv_general_dilated(
        xl, gl,
        window_strides=dilation,
        padding=padding,
        rhs_dilation=stride,
        dimension_numbers=("N" + spatial + "C", spatial + "IO", "N" + spatial + "C"),
        preferred_element_type=jnp.float32,
    )                                            # (inmaps, *size, outmaps)
    return jnp.transpose(out, (nd + 1, 0) + tuple(range(1, 1 + nd)))


def _tryWinogradFG(x, grad, size, stride, pad, dilation, groups):
    """Transform-domain bwd-filter for the 3x3 stride-1 bf16 geometry: the
    16 tile-contraction dots have ideal MXU shape (M = C, N = CO, K = tiles),
    unlike the direct formulation whose output is only CO x C*9.
    Returns None when not applicable."""
    from puzzlelib_tpu import config as Config

    algo = getattr(Config, "convAlgo", "auto")
    if algo == "xla" or _pallasDisabled or jax.default_backend() == "cpu":
        return None

    if x.ndim != 4 or tuple(size) != (3, 3):
        return None

    if x.dtype != jnp.bfloat16 or grad.dtype != jnp.bfloat16:
        return None

    if algo != "winograd":
        choice = _algoChoice.get(("fg", x.shape, grad.shape, tuple(pad)))
        if choice != "winograd":
            return None

    from puzzlelib_tpu.ops.pallas import winograd as pwino

    if not pwino.filterGradApplicable(x.shape, grad.shape, stride, pad,
                                      dilation, groups, x.dtype):
        return None

    key = ("winoFG", x.shape, grad.shape, tuple(pad), str(x.dtype))
    if key in _pallasFailed:
        return None

    if not pwino.probeCompileFG(x.shape, grad.shape, tuple(pad), x.dtype):
        _pallasFailed.add(key)
        logger.warning(
            "Winograd bwd-filter probe-compile failed for x%s dy%s %s; this "
            "shape runs on the XLA fallback for the rest of the process",
            x.shape, grad.shape, x.dtype)
        return None

    try:
        return pwino.filterGradNHWC(_toNhwc(x), _toNhwc(grad), tuple(pad))
    except Exception:
        _pallasFailed.add(key)
        logger.warning(
            "Winograd bwd-filter failed at trace time for x%s dy%s %s; "
            "falling back to XLA for this shape", x.shape, grad.shape, x.dtype)
        return None


def _filterGrad(x, grad, size, stride, pad, dilation, groups):
    """dW (outmaps, inmaps//groups, *size) of the forward conv, f32 accumulate."""
    if groups == 1:
        dw = _tryWinogradFG(x, grad, size, stride, pad, dilation, groups)

        if dw is not None:
            dispatchStats["winogradFG"] += 1
            return dw

    dispatchStats["xlaFG"] += 1

    dense = _filterGradDenseNhwc if _useChannelsLast(x.dtype) else _filterGradDense

    if groups == 1:
        return dense(x, grad, size, stride, pad, dilation)

    inmaps, outmaps = x.shape[1], grad.shape[1]
    cpg, opg = inmaps // groups, outmaps // groups

    parts = [
        dense(x[:, g * cpg:(g + 1) * cpg], grad[:, g * opg:(g + 1) * opg],
              size, stride, pad, dilation)
        for g in range(groups)
    ]
    return jnp.concatenate(parts, axis=0)


@_pallasGateKey
@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups", "hasBias", "xlaOnly"))
def convNdBackwardParams(x, grad, wshape_w, stride, pad, dilation, groups, hasBias=False, xlaOnly=False):
    size = wshape_w.shape[2:]
    dw = _filterGrad(x, grad, size, stride, pad, dilation, groups).astype(wshape_w.dtype)

    db = None
    if hasBias:
        axes = (0, ) + tuple(range(2, grad.ndim))
        db = jnp.sum(grad.astype(jnp.float32), axis=axes).astype(grad.dtype)

    return dw, db


# -- bwd-data: direct transposed conv ------------------------------------------

def _transposedConv(y, w, stride, pad, dilation, adj, groups):
    """Map y (N, outmaps, *yspatial) back through forward-conv kernel
    w (outmaps, inmaps//groups, *size): input-dilate y by stride and convolve
    with the spatially-flipped, IO-swapped kernel.  ``adj`` is the extra high
    padding per axis recovering sizes lost to stride flooring."""
    nd = y.ndim - 2
    size = w.shape[2:]

    spatialAxes = tuple(range(2, 2 + nd))
    wT = jnp.flip(w, spatialAxes).swapaxes(0, 1)  # (inmaps//groups, outmaps, *size)

    # stride-1 transposed conv IS a plain conv of y with the flipped kernel:
    # route through _convCore so it reaches the Pallas small-CO kernel
    if (all(s == 1 for s in stride) and all(a == 0 for a in adj) and groups == 1
            and all(dilation[i] * (size[i] - 1) >= pad[i] for i in range(nd))):
        return _convCore(
            y, wT,
            (1, ) * nd,
            tuple(dilation[i] * (size[i] - 1) - pad[i] for i in range(nd)),
            dilation, 1,
        )

    padding = tuple(
        (dilation[i] * (size[i] - 1) - pad[i],
         dilation[i] * (size[i] - 1) - pad[i] + adj[i])
        for i in range(nd)
    )

    outmaps = y.shape[1]
    opg = outmaps // groups

    if groups > 1:
        # fold the per-group kernels into one OIHW kernel for
        # feature_group_count: wT (cpg, outmaps, *size) regrouped to
        # (groups*cpg, opg, *size) - a single conv, no per-group unroll
        cpg = wT.shape[0]
        wT = wT.reshape((cpg, groups, opg) + size).swapaxes(0, 1) \
               .reshape((groups * cpg, opg) + size)

    if _useChannelsLast(y.dtype):
        out = lax.conv_general_dilated(
            _toNhwc(y), jnp.transpose(wT, tuple(range(2, 2 + nd)) + (1, 0)),
            window_strides=(1, ) * nd,
            padding=padding,
            lhs_dilation=stride,
            rhs_dilation=dilation,
            dimension_numbers=_channelsLastNumbers(nd),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        )
        return _fromNhwc(out).astype(y.dtype)

    # kernel laid out (I, O, *size) -> swapped above, so I plays O
    return lax.conv_general_dilated(
        y.astype(jnp.float32), wT.astype(jnp.float32),
        window_strides=(1, ) * nd,
        padding=padding,
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=_dimNumbers(nd),
        feature_group_count=groups,
    ).astype(y.dtype)


def _strideAdjust(inspatial, size, stride, pad, dilation):
    """Per-axis remainder lost by the forward conv's stride flooring."""
    return tuple(
        inspatial[i] + 2 * pad[i] - (dilation[i] * (size[i] - 1) + 1)
        - stride[i] * ((inspatial[i] + 2 * pad[i] - dilation[i] * (size[i] - 1) - 1) // stride[i])
        for i in range(len(size))
    )


@_pallasGateKey
@partial(jax.jit, static_argnames=("xshape", "stride", "pad", "dilation", "groups", "xlaOnly"))
def convNdBackwardData(grad, w, xshape, stride, pad, dilation, groups, xlaOnly=False):
    size = w.shape[2:]
    adj = _strideAdjust(xshape[2:], size, stride, pad, dilation)

    return _transposedConv(grad, w, stride, pad, dilation, adj, groups).astype(grad.dtype)


# -- deconvolution (transposed conv, cuDNN-style: fwd == conv bwd-data) ---------

@_pallasGateKey
@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "postpad", "groups", "hasBias", "xlaOnly"))
def deconvNd(x, w, b, stride, pad, dilation, postpad, groups, hasBias=False, xlaOnly=False):
    # deconv kernel is (inmaps, outmaps//groups, *size): exactly the forward-
    # conv kernel of the reverse direction, so fwd == transposed conv with
    # postpad as the stride adjustment
    out = _transposedConv(x, w, stride, pad, dilation, postpad, groups).astype(x.dtype)

    if hasBias:
        out = out + b.reshape((1, b.size) + (1, ) * (x.ndim - 2)).astype(out.dtype)

    return out


@_pallasGateKey
@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "groups", "xlaOnly"))
def deconvNdBackwardData(grad, w, stride, pad, dilation, groups, xlaOnly=False):
    # gradient of deconv wrt input == the plain forward conv of grad with w
    # (w is already OIHW for that direction: O=inmaps, I=outmaps//groups)
    return _convCore(grad, w, stride, pad, dilation, groups)


@_pallasGateKey
@partial(jax.jit, static_argnames=("stride", "pad", "dilation", "postpad", "groups", "hasBias", "xlaOnly"))
def deconvNdBackwardParams(x, grad, w, stride, pad, dilation, postpad, groups, hasBias=False, xlaOnly=False):
    # deconv is the conv that maps grad-space -> x-space, so its filter
    # gradient is the forward-conv filter gradient with the roles swapped
    size = w.shape[2:]
    dw = _filterGrad(grad, x, size, stride, pad, dilation, groups).astype(w.dtype)

    db = None
    if hasBias:
        axes = (0, ) + tuple(range(2, grad.ndim))
        db = jnp.sum(grad.astype(jnp.float32), axis=axes).astype(grad.dtype)

    return dw, db
