"""Fused Winograd F(2x2, 3x3) convolution for the TPU MXU.

The 3x3 stride-1 convs that dominate ResNet/VGG/UNet bodies run at ~40% of
the bf16 roofline through XLA's implicit-GEMM lowering, and direct Pallas
schedules measured no better: at C = CO >= 128 the MXU work per byte is
simply too low.  Winograd changes the arithmetic instead of the schedule -
each 4x4 input tile (stride 2) yields a 2x2 output tile through

    Y = A^T [ (G g G^T) . (B^T d B) ] A

with the elementwise product batched over channels as 16 GEMMs of
contraction depth C: 2.25x fewer MXU FLOPs than the direct conv.  The cuDNN
conv binding ships the same trade as its WINOGRAD algo family
(/root/reference/Cuda/Source/Libs/CuDnn.c:1155-1220); here the transform
pipeline is fused into one Pallas kernel so the 4x transform-domain
inflation never touches HBM:

- Layout: HBM bf16 arrays carry a tiled (8, 128)(2, 1) layout, so any
  fine-grained phase slice on a sublane-adjacent axis (``x[..., bp::2, :]``
  or a size-1 slice of an interleaved pair) is either illegal in Mosaic or
  a ~18 GB/s crawl in XLA.  The entry therefore splits only the ROW phase
  (two coarse slices with contiguous W*C-granule runs - HBM speed) and
  keeps the COLUMN phase interleaved in the lane dimension: each slab is
  (N, TH*TWP, 2C) with rows = flattened (i, j) tiles of pitch TWP = TW+1
  and lanes = bp*C + channel.
- The kernel's four phase fetches select (row slab, column parity) as
  (slab index, 128-aligned lane offset) - both legal, both handled by the
  DMA engine, overlapped with compute.  Every Winograd tap d[a][b] of a
  block of MB = bi*TWP tiles is then a *sublane-offset alias* of a phase
  buffer - offset (a//2)*TWP + b//2 - so patch extraction costs nothing.
- The B^T d B transform is two butterfly stages of +/- adds on (MB, C)
  blocks (on the VPU, in the input dtype: bf16 halves the VMEM traffic of
  the f32 variant and costs ~half a mantissa bit on top of Winograd's own
  bit); each of the 16 (xi, nu) products is one MXU dot against the
  resident transformed filter U[xi nu] (C, CO).
- The inverse transform A^T m A accumulates the four output phases in f32
  scratch as each dot retires ("rmw"; a 16-block materialise-then-combine
  variant, "mcat", measured slower with 4x the m scratch and was removed
  2026-08-19 - earn-or-trim); the two column phases of
  a row slab concatenate on lanes (CO-aligned, free) and the output leaves
  in the same lane-interleaved slab layout - the exit is a coarse
  row-granule transpose + crop, again HBM speed.

bf16 only (the MXU path); f32 is compiled for exactness tests.  Winograd
costs ~1 extra mantissa bit vs the direct conv (measured ~6e-3 max rel err
on randn vs the f32 oracle, direct bf16 ~3e-3).  3x3, stride 1, dilation 1,
groups 1.

Honest-marginal status (see docs/kernels.md): the fused kernel reaches
84/77/55 % of peak in direct-FLOP terms at the ResNet-50 56/28 and VGG-112
body shapes - but XLA's NHWC conv measures 85/94/75 % there, so the forward
only ties its best case and dispatch is decided per shape by measurement
(ops.conv.measureAlgoChoice).  The transform-domain bwd-filter is the pass
with a structural edge (the direct formulation's GEMM geometry is
CO x C*9-output-bound).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _fetchRows(bi, twp):
    """Sublane rows of one phase-slab DMA: (bi+1)*twp + 1 for the (1, 1)
    tap of the last tile, rounded up to the 8-sublane granule."""
    return -(-((bi + 1) * twp + 1) // 8) * 8

# A^T of F(2x2, 3x3); B^T/G live implicitly in the butterflies / filter pass
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))
_G = np.array([[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]], np.float64)


def _kernel(xRef, uRef, outRef, buf, t1, m, sems, *,
            bi, twp, mb, c, cb, co, nBlocks, nCc, outDtype):
    n, blk, cc = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    step = (n * nBlocks + blk) * nCc + cc
    total = pl.num_programs(0) * nBlocks * nCc

    rows = _fetchRows(bi, twp)

    def fetch(slot, nI, blkI, ccI):
        # phase (pa, pb): row slab pa, column parity pb as a 128-aligned
        # lane offset into the (rows, 2C) slab.  With one height block the
        # row offset is the literal 0: Mosaic's alignment prover does not
        # const-fold blkI even over a 1-sized grid dimension, and mb is only
        # guaranteed 8-divisible when nBlocks > 1 (_pickBlock).
        rowOff = (blkI * bi * twp) if nBlocks > 1 else 0
        return [
            pltpu.make_async_copy(
                xRef.at[pa, nI, pl.ds(rowOff, rows),
                        pl.ds(pb * c + ccI * cb, cb)],
                buf.at[slot, pa * 2 + pb],
                sems.at[slot, pa * 2 + pb],
            )
            for pa in range(2) for pb in range(2)
        ]

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for cp in fetch(slot, n, blk, cc):
            cp.start()

    nxt = step + 1
    ccN = jax.lax.rem(nxt, nCc)
    blkN = jax.lax.rem(nxt // nCc, nBlocks)
    nN = nxt // (nCc * nBlocks)

    @pl.when(nxt < total)
    def _():
        for cp in fetch(1 - slot, nN, blkN, ccN):
            cp.start()

    for cp in fetch(slot, n, blk, cc):
        cp.wait()

    # Winograd tap d[a][b]: pure sublane-offset alias into phase (a%2, b%2),
    # in the input dtype (bf16 butterflies: half the VMEM traffic of f32)
    def d(a, b):
        off = (a // 2) * twp + (b // 2)
        return buf[slot, (a % 2) * 2 + (b % 2), pl.ds(off, mb), :]

    # stage 1: B^T along the a (row) axis, one (MB, cb) block per (x, b)
    for b in range(4):
        d0, d1, d2, d3 = d(0, b), d(1, b), d(2, b), d(3, b)
        t1[0 * 4 + b] = d0 - d2
        t1[1 * 4 + b] = d1 + d2
        t1[2 * 4 + b] = d2 - d1
        t1[3 * 4 + b] = d1 - d3

    # stage 2 (B along b) + the 16 GEMMs + A^T m A: accumulate the four
    # output phases in f32 scratch as each dot retires - 12*mb*co less VMEM
    # than materialising the 16 m blocks, which is what makes C = CO = 512
    # shapes fit with the filter resident (and measured faster besides).
    written = set()

    for xi in range(4):
        tb0, tb1, tb2, tb3 = (t1[xi * 4 + b] for b in range(4))

        for nu, expr in enumerate((tb0 - tb2, tb1 + tb2, tb2 - tb1, tb1 - tb3)):
            uChunk = uRef[xi * 4 + nu, pl.ds(cc * cb, cb), :]
            part = jnp.dot(expr, uChunk, preferred_element_type=jnp.float32,
                           precision=(jax.lax.Precision.HIGHEST
                                      if outDtype == jnp.float32
                                      else jax.lax.Precision.DEFAULT))

            targets = [
                (ap * 2 + bp,
                 part if _AT[ap][xi] * _AT[bp][nu] > 0 else -part)
                for ap in range(2) if _AT[ap][xi] != 0
                for bp in range(2) if _AT[bp][nu] != 0
            ]

            for k, term in targets:
                if k not in written:
                    written.add(k)

                    if nCc == 1:
                        m[k] = term
                    else:
                        @pl.when(cc == 0)
                        def _(term=term, k=k):
                            m[k] = term

                        @pl.when(cc != 0)
                        def _(term=term, k=k):
                            m[k] += term
                else:
                    m[k] += term

    # output phase (ap, bp): already accumulated in the retire loop above
    def yPhase(ap, bp):
        return m[ap * 2 + bp].astype(outDtype)

    # emit in the same lane-interleaved slab layout: row slab ap, lanes
    # bp*CO + channel (the concat is CO-aligned on lanes, i.e. free)
    @pl.when(cc == nCc - 1)
    def _():
        for ap in range(2):
            outRef[0, 0, ap] = jnp.concatenate(
                (yPhase(ap, 0), yPhase(ap, 1)), axis=1)


@functools.partial(jax.jit, static_argnames=("bi", "twp", "cb", "co", "nBlocks",
                                             "nCc", "interpret"))
def _winogradHC(xs, u, *, bi, twp, cb, co, nBlocks, nCc, interpret=False):
    """xs (2, N, rows, 2C) row-phase slabs (rows = flattened (i, j) tiles
    with pitch twp, lanes = bp*C + channel); u (16, C, CO) transformed
    filter.  Returns (N, nBlocks, 2, MB, 2*CO) in the same slab layout."""
    n = xs.shape[1]
    c = xs.shape[3] // 2
    mb = bi * twp

    return pl.pallas_call(
        functools.partial(
            _kernel, bi=bi, twp=twp, mb=mb, c=c, cb=cb, co=co,
            nBlocks=nBlocks, nCc=nCc, outDtype=xs.dtype,
        ),
        grid=(n, nBlocks, nCc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # slabs in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),      # filter fully resident:
            # a (16, cb, co) blocked spec would re-DMA 4 MB per cc step
        ],
        out_specs=pl.BlockSpec((1, 1, 2, mb, 2 * co),
                               lambda nI, blkI, ccI: (nI, blkI, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, nBlocks, 2, mb, 2 * co), xs.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4, _fetchRows(bi, twp), cb), xs.dtype),
            pltpu.VMEM((16, mb, cb), xs.dtype),
            pltpu.VMEM((4, mb, co), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * nBlocks * nCc * 16 * mb * cb * co,
            bytes_accessed=int(xs.size * xs.dtype.itemsize * (bi + 1) / bi
                               + u.size * u.dtype.itemsize
                               + n * nBlocks * 4 * mb * co * xs.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, u)


def _vmemBytes(bi, twp, c, cb, co, itemsize):
    mb = bi * twp

    return (2 * 4 * _fetchRows(bi, twp) * cb * itemsize  # phase double buffers
            + 16 * mb * cb * itemsize                    # stage-1 butterflies
            + 4 * mb * co * 4                            # phase-accum scratch
            + 2 * 2 * mb * 2 * co * itemsize             # pipelined out block
            + 16 * c * co * itemsize)                    # fully resident filter


def _pickBlock(th, twp, c, cb, co, itemsize, vmemBudget=13 * 2 ** 20):
    """Largest tile-row block under the VMEM budget (MB >= ~128 for the MXU,
    minimal padded-row overhead).  Returns bi or None."""
    best, bestBi = None, None

    for bi in range(min(th, 16), 0, -1):
        # multi-block DMAs start at blk*bi*twp sublanes: Mosaic requires
        # a provably 8-divisible start (moot with one block per height)
        if bi < th and (bi * twp) % 8 != 0:
            continue

        if _vmemBytes(bi, twp, c, cb, co, itemsize) > vmemBudget:
            continue

        nBlocks = -(-th // bi)
        cand = (nBlocks * bi / th, -min(bi * twp, 256))

        if best is None or cand < best:
            best, bestBi = cand, bi

    return bestBi


def applicable(xshape, wshape, stride, pad, dilation, groups, dtype=jnp.bfloat16):
    """Static eligibility (NCHW shapes): 3x3, stride 1, C/CO multiples of 128."""
    if len(xshape) != 4 or groups != 1:
        return False

    if any(s != 1 for s in stride) or any(d != 1 for d in dilation):
        return False

    n, c, h, w = xshape
    co, ci, kh, kw = wshape

    if (kh, kw) != (3, 3) or c % LANES != 0 or co % LANES != 0:
        return False

    oh = h + 2 * pad[0] - 2
    ow = w + 2 * pad[1] - 2
    if oh < 2 or ow < 2:
        return False

    th, tw = -(-oh // 2), -(-ow // 2)
    cb = _chunkC(c)
    itemsize = np.dtype(dtype).itemsize

    return _pickBlock(th, tw + 1, c, cb, co, itemsize) is not None


def _chunkC(c):
    """Input-channel chunk: biggest 128-multiple divisor of c up to 256."""
    return 256 if c % 256 == 0 else LANES


def _filterTransform(w):
    """(CO, C, 3, 3) -> U (16, C, CO): G g G^T per (c, o), f32 exact
    (G entries are 0/1/0.5)."""
    g = jnp.asarray(_G, jnp.float32)
    u = jnp.einsum("xr,ocrs,ys->xyco", g, w.astype(jnp.float32), g)
    return u.reshape(16, w.shape[1], w.shape[0]).astype(w.dtype)


def _rowSlabs(xl, n, hp2, twp, c, rowsNeeded):
    """(N, 2*hp2, 2*twp, C) padded NHWC -> (2, N, rows, 2C) row-phase slabs:
    two coarse dim-2 slices (contiguous 2*twp*C-granule runs), then free
    reshapes folding the column parity into the lanes."""
    xe = xl.reshape(n, hp2, 2, 2 * twp, c)

    xs = jnp.stack([xe[:, :, ap] for ap in range(2)])
    xs = xs.reshape(2, n, hp2 * twp, 2 * c)

    if xs.shape[2] < rowsNeeded:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, rowsNeeded - xs.shape[2]), (0, 0)))

    return xs


def conv2dNHWC(x, w, pad=(0, 0), bi=None, interpret=False):
    """NHWC 3x3 stride-1 conv through the fused Winograd kernel; w is OIHW."""
    n, h, wd, c = x.shape
    co = w.shape[0]

    oh, ow = h + 2 * pad[0] - 2, wd + 2 * pad[1] - 2
    th, tw = -(-oh // 2), -(-ow // 2)
    twp = tw + 1                      # tile pitch: the halo column rides along
    cb = _chunkC(c)

    if bi is None:
        bi = _tuned.get((tuple(x.shape), tuple(w.shape), tuple(pad),
                         np.dtype(x.dtype).str))

    if bi is None:
        bi = _pickBlock(th, twp, c, cb, co, x.dtype.itemsize)
        if bi is None:
            raise ValueError("no VMEM-feasible block for %s conv %s" % (x.shape, w.shape))

    nBlocks = -(-th // bi)
    nCc = c // cb

    # pad so slabs cover rows 2i+a for i <= nBlocks*bi + 1 (the +1 is the
    # tail the last rounded DMA touches), cols 2j+b for j < twp
    hp2 = nBlocks * bi + 2
    xl = jnp.pad(x, ((0, 0), (pad[0], 2 * hp2 - h - pad[0]),
                     (pad[1], 2 * twp - wd - pad[1]), (0, 0)))

    rowsNeeded = (nBlocks - 1) * bi * twp + _fetchRows(bi, twp)
    xs = _rowSlabs(xl, n, hp2, twp, c, rowsNeeded)

    u = _filterTransform(w)

    out = _winogradHC(xs, u, bi=bi, twp=twp, cb=cb, co=co, nBlocks=nBlocks,
                      nCc=nCc, interpret=interpret)

    # exit: (N, nB, 2, bi, twp, 2, CO) -> swap (bi, ap) - a coarse transpose
    # with contiguous twp*2*CO-granule runs - then crop
    out = out.reshape(n, nBlocks, 2, bi, twp, 2, co)
    out = out.transpose(0, 1, 3, 2, 4, 5, 6)
    return out.reshape(n, nBlocks * bi * 2, twp * 2, co)[:, :oh, :ow, :]


def conv2d(x, w, pad=(0, 0), bi=None, interpret=False):
    """NCHW wrapper around the NHWC core (transposes fuse/cancel inside
    larger jitted programs)."""
    out = conv2dNHWC(x.transpose(0, 2, 3, 1), w, pad, bi=bi, interpret=interpret)
    return out.transpose(0, 3, 1, 2)


_tuned = {}


def autotune(xshape, wshape, pad=(0, 0), dtype=jnp.bfloat16, iters=6, maxCandidates=4):
    """Time feasible bi blocks on device; cache per signature (NHWC xshape)."""
    import time

    key = (tuple(xshape), tuple(wshape), tuple(pad), np.dtype(dtype).str)
    if key in _tuned:
        return _tuned[key]

    n, h, wd, c = xshape
    co = wshape[0]
    oh, ow = h + 2 * pad[0] - 2, wd + 2 * pad[1] - 2
    th, twp = -(-oh // 2), -(-ow // 2) + 1
    cb = _chunkC(c)
    itemsize = np.dtype(dtype).itemsize

    x = jnp.zeros(xshape, dtype)
    w = jnp.zeros(wshape, dtype)

    feasible = [
        bi
        for bi in range(1, min(th, 16) + 1)
        if (bi >= th or (bi * twp) % 8 == 0)
        and _vmemBytes(bi, twp, c, cb, co, itemsize) <= 13 * 2 ** 20
    ]
    feasible.sort(key=lambda bi: (-(-th // bi) * bi / th,
                                  abs(bi * twp - 256)))

    best, bestBi = float("inf"), None

    for bi in feasible[:maxCandidates]:
        try:
            @jax.jit
            def chained(x, w, bi=bi):
                acc = jnp.zeros((8, ), jnp.float32)
                for i in range(iters):
                    out = conv2dNHWC(x, w + jnp.asarray(i, dtype), pad, bi=bi)
                    acc += out.ravel()[:8].astype(jnp.float32)
                return acc

            np.asarray(chained(x, w).ravel()[:1])

            start = time.perf_counter()
            for _ in range(2):
                out = chained(x, w)
            np.asarray(out.ravel()[:1])
            secs = (time.perf_counter() - start) / 2 / iters

        except Exception:
            continue

        if secs < best:
            best, bestBi = secs, bi

    _tuned[key] = bestBi
    return bestBi


# ---------------------------------------------------------------------------
# backward passes in the transform domain
#
# bwd-data for stride-1 is the forward kernel on the 180-degree-rotated,
# io-swapped filter.  bwd-filter contracts over TILES instead of channels:
#
#     dU[xi nu] = V[xi nu]^T Mbar[xi nu],   dW = G^T dU G
#
# with V = B^T d B (input tiles, as forward) and Mbar = A dY A^T (gradient
# tiles, no halo).  Each of the 16 dots is (C, T) x (T, CO) - M = C,
# N = CO, K = n*th*tw tiles: ideal MXU geometry, unlike the direct
# bwd-filter GEMM whose output is only CO x C*9.  Matches the role of
# cuDNN's WINOGRAD_NONFUSED bwd-filter algo
# (/root/reference/Cuda/Source/Libs/CuDnn.c convNdBackwardParams).
# ---------------------------------------------------------------------------

# nonzero A^T columns: Mbar[xi nu] = sum over (ap in _ACOL[xi], bp in
# _ACOL[nu]) of sign * dY[ap bp]
_ACOL = tuple(
    tuple((ap, _AT[ap][xi]) for ap in range(2) if _AT[ap][xi] != 0)
    for xi in range(4)
)


def _fgKernel(xRef, yRef, outRef, xBuf, yBuf, t1, acc, xSems, ySems, *,
              bi, twp, mb, c, co, cob, nBlocks, nN):
    coc, nI, blk = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    step = (coc * nN + nI) * nBlocks + blk
    total = pl.num_programs(0) * nN * nBlocks

    rowsX = _fetchRows(bi, twp)
    rowsY = -(-mb // 8) * 8

    def fetch(slot, cocI, nII, blkI):
        # static 0 row offset when there is a single height block: mb is only
        # guaranteed 8-divisible for nBlocks > 1 (_pickBlockFG), and Mosaic
        # does not const-fold blkI over a 1-sized grid dimension
        rowOff = (blkI * mb) if nBlocks > 1 else 0
        xs = [
            pltpu.make_async_copy(
                xRef.at[pa, nII, pl.ds(rowOff, rowsX),
                        pl.ds(pb * c, c)],
                xBuf.at[slot, pa * 2 + pb], xSems.at[slot, pa * 2 + pb])
            for pa in range(2) for pb in range(2)
        ]
        ys = [
            pltpu.make_async_copy(
                yRef.at[pa, nII, pl.ds(rowOff, rowsY),
                        pl.ds(pb * co + cocI * cob, cob)],
                yBuf.at[slot, pa * 2 + pb], ySems.at[slot, pa * 2 + pb])
            for pa in range(2) for pb in range(2)
        ]
        return xs + ys

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for cp in fetch(slot, coc, nI, blk):
            cp.start()

    nxt = step + 1
    blkN = jax.lax.rem(nxt, nBlocks)
    nIN = jax.lax.rem(nxt // nBlocks, nN)
    cocN = nxt // (nBlocks * nN)

    @pl.when(nxt < total)
    def _():
        for cp in fetch(1 - slot, cocN, nIN, blkN):
            cp.start()

    for cp in fetch(slot, coc, nI, blk):
        cp.wait()

    def d(a, b):
        off = (a // 2) * twp + (b // 2)
        return xBuf[slot, (a % 2) * 2 + (b % 2), pl.ds(off, mb), :]

    first = jnp.logical_and(nI == 0, blk == 0)

    # per xi: stage-1 butterflies into a (4, mb, c) scratch (kept small so
    # C = 512 fits VMEM), then the nu combines, Mbar, and the tile dot
    for xi in range(4):
        for b in range(4):
            if xi == 0:
                t1[b] = d(0, b) - d(2, b)
            elif xi == 1:
                t1[b] = d(1, b) + d(2, b)
            elif xi == 2:
                t1[b] = d(2, b) - d(1, b)
            else:
                t1[b] = d(1, b) - d(3, b)

        tb0, tb1, tb2, tb3 = t1[0], t1[1], t1[2], t1[3]

        for nu, v in enumerate((tb0 - tb2, tb1 + tb2, tb2 - tb1, tb1 - tb3)):
            mbar = None
            for ap, sa in _ACOL[xi]:
                for bp, sb in _ACOL[nu]:
                    term = yBuf[slot, ap * 2 + bp, pl.ds(0, mb), :]
                    if sa * sb < 0:
                        term = -term
                    mbar = term if mbar is None else mbar + term

            part = jax.lax.dot_general(
                v, mbar, (((0, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if v.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT))

            k = xi * 4 + nu

            @pl.when(first)
            def _(part=part, k=k):
                acc[k] = part

            @pl.when(jnp.logical_not(first))
            def _(part=part, k=k):
                acc[k] += part

    @pl.when(jnp.logical_and(nI == nN - 1, blk == nBlocks - 1))
    def _():
        outRef[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("bi", "twp", "cob",
                                             "nBlocks", "interpret"))
def _winogradFG(xs, ys, *, bi, twp, cob, nBlocks, interpret=False):
    """xs (2, N, rowsX, 2C) input row-phase slabs (pitch twp, with halo);
    ys (2, N, rowsY, 2CO) gradient row-phase slabs (same pitch, no halo);
    both lane-interleave the column parity.  Returns dU (16, C, CO) f32."""
    n, c, co = xs.shape[1], xs.shape[3] // 2, ys.shape[3] // 2
    mb = bi * twp

    return pl.pallas_call(
        functools.partial(
            _fgKernel, bi=bi, twp=twp, mb=mb, c=c, co=co, cob=cob,
            nBlocks=nBlocks, nN=n,
        ),
        grid=(co // cob, n, nBlocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((16, c, cob), lambda coc, nI, blk: (0, 0, coc)),
        out_shape=jax.ShapeDtypeStruct((16, c, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 4, _fetchRows(bi, twp), c), xs.dtype),
            pltpu.VMEM((2, 4, -(-mb // 8) * 8, cob), ys.dtype),
            pltpu.VMEM((4, mb, c), xs.dtype),
            pltpu.VMEM((16, c, cob), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (co // cob) * n * nBlocks * 16 * mb * c * cob,
            bytes_accessed=int((co // cob) * xs.size * xs.dtype.itemsize
                               + ys.size * ys.dtype.itemsize
                               + 16 * c * co * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys)


def _vmemBytesFG(bi, twp, c, cob, itemsize):
    mb = bi * twp

    return (2 * 4 * _fetchRows(bi, twp) * c * itemsize   # x phase buffers
            + 2 * 4 * -(-mb // 8) * 8 * cob * itemsize   # dy phase buffers
            + 4 * mb * c * itemsize                      # per-xi butterflies
            + 2 * 16 * c * cob * 4)                      # f32 acc + out block


def _pickBlockFG(th, twp, c, cob, itemsize, vmemBudget=13 * 2 ** 20,
                 aligned=True):
    """Largest tile-row block: K (= MB) wants >= ~256 for the tile dots."""
    best, bestBi = None, None

    for bi in range(min(th, 24), 0, -1):
        # MB must stay sublane-aligned even for a single height block:
        # Mosaic rejects the slab DMAs whenever bi*twp % 8 != 0 (measured on
        # v5e: (32,512,28,28) with bi=14/mb=210 fails, bi=8/mb=120 compiles).
        # Interpret mode has no such constraint (aligned=False).
        if aligned and (bi * twp) % 8 != 0:
            continue

        if _vmemBytesFG(bi, twp, c, cob, itemsize) > vmemBudget:
            continue

        nBlocks = -(-th // bi)
        cand = (nBlocks * bi / th, abs(bi * twp - 384))

        if best is None or cand < best:
            best, bestBi = cand, bi

    return bestBi


def _pickFG(th, twp, c, co, itemsize, aligned=True):
    """(bi, cob) under the VMEM budget: full-CO accumulators when they fit,
    CO-chunked otherwise (the f32 dU accumulator is the big tenant)."""
    for cob in (256, 128):
        if co % cob != 0:
            continue

        bi = _pickBlockFG(th, twp, c, cob, itemsize, aligned=aligned)
        if bi is not None:
            return bi, cob

    return None


def filterGradApplicable(xshape, dyshape, stride, pad, dilation, groups,
                         dtype=jnp.bfloat16):
    """Static eligibility for the transform-domain bwd-filter (NCHW)."""
    if len(xshape) != 4 or groups != 1:
        return False

    if any(s != 1 for s in stride) or any(d != 1 for d in dilation):
        return False

    n, c, h, w = xshape
    co = dyshape[1]
    oh, ow = dyshape[2], dyshape[3]

    if (h + 2 * pad[0] - oh, w + 2 * pad[1] - ow) != (2, 2):   # 3x3 only
        return False

    if c % LANES != 0 or co % LANES != 0:
        return False

    th, tw = -(-oh // 2), -(-ow // 2)
    itemsize = np.dtype(dtype).itemsize

    return _pickFG(th, tw + 1, c, co, itemsize) is not None


def filterGradNHWC(x, dy, pad=(0, 0), bi=None, interpret=False):
    """x (N, H, W, C), dy (N, OH, OW, CO) -> dW (CO, C, 3, 3) f32 through
    the transform-domain kernel."""
    n, h, wd, c = x.shape
    oh, ow, co = dy.shape[1], dy.shape[2], dy.shape[3]

    th, tw = -(-oh // 2), -(-ow // 2)
    twp = tw + 1
    itemsize = np.dtype(x.dtype).itemsize

    picked = _pickFG(th, twp, c, co, itemsize, aligned=not interpret)
    if picked is None:
        raise ValueError("no VMEM-feasible block for %s filterGrad %s"
                         % (x.shape, dy.shape))
    cob = picked[1]

    if bi is None:
        bi = picked[0]

    if not interpret and (bi * twp) % 8 != 0:
        raise ValueError("filterGrad block bi=%d gives MB=%d %% 8 != 0 "
                         "(Mosaic rejects unaligned slab DMAs)" % (bi, bi * twp))

    nBlocks = -(-th // bi)
    mb = bi * twp

    # input row-phase slabs, exactly as the forward entry
    hp2 = nBlocks * bi + 2
    xl = jnp.pad(x, ((0, 0), (pad[0], 2 * hp2 - h - pad[0]),
                     (pad[1], 2 * twp - wd - pad[1]), (0, 0)))
    rowsNeeded = (nBlocks - 1) * mb + _fetchRows(bi, twp)
    xs = _rowSlabs(xl, n, hp2, twp, c, rowsNeeded)

    # gradient row-phase slabs: same pitch, zero-padded (the zeros null out
    # the garbage columns of the input slabs in the tile contraction)
    dyl = jnp.pad(dy, ((0, 0), (0, 2 * nBlocks * bi - oh),
                       (0, 2 * twp - ow), (0, 0)))
    rowsY = (nBlocks - 1) * mb + -(-mb // 8) * 8
    ys = _rowSlabs(dyl, n, nBlocks * bi, twp, co, rowsY)

    du = _winogradFG(xs, ys, bi=bi, twp=twp, cob=cob,
                     nBlocks=nBlocks, interpret=interpret)

    # dW = G^T dU G on the (xi, nu) axes - tiny, XLA
    g = jnp.asarray(_G, jnp.float32)
    du = du.reshape(4, 4, c, co)
    return jnp.einsum("xr,ys,xyco->ocrs", g, g, du)


def dataGradNHWC(dy, w, pad=(0, 0), bi=None, interpret=False):
    """bwd-data for the stride-1 3x3 conv: the forward Winograd kernel on
    the 180-rotated, io-swapped filter.  dy (N, OH, OW, CO), w (CO, C, 3, 3)
    -> dX (N, H, W, C) where H = OH - 2*pad + 2."""
    wr = w[:, :, ::-1, ::-1].transpose(1, 0, 2, 3)
    return conv2dNHWC(dy, wr, (2 - pad[0], 2 - pad[1]), bi=bi,
                      interpret=interpret)


_probeResults = {}


def probeCompile(xshape, wshape, pad, dtype):
    """Eager one-time compile probe (see pallas.conv.probeCompile);
    xshape is NCHW (the dispatch-facing signature)."""
    key = (tuple(xshape), tuple(wshape), tuple(pad), np.dtype(dtype).str)
    cached = _probeResults.get(key)
    if cached is not None:
        return cached

    try:
        x = jax.ShapeDtypeStruct(tuple(xshape), dtype)
        w = jax.ShapeDtypeStruct(tuple(wshape), dtype)
        jax.jit(lambda a, b: conv2d(a, b, tuple(pad))).lower(x, w).compile()
        ok = True
    except Exception:
        ok = False

    _probeResults[key] = ok
    return ok


def probeCompileFG(xshape, dyshape, pad, dtype):
    """Eager one-time compile probe for the bwd-filter kernel (NCHW)."""
    key = ("fg", tuple(xshape), tuple(dyshape), tuple(pad), np.dtype(dtype).str)
    cached = _probeResults.get(key)
    if cached is not None:
        return cached

    try:
        n, c, h, w = xshape
        co, oh, ow = dyshape[1], dyshape[2], dyshape[3]
        x = jax.ShapeDtypeStruct((n, h, w, c), dtype)
        dy = jax.ShapeDtypeStruct((n, oh, ow, co), dtype)
        jax.jit(lambda a, b: filterGradNHWC(a, b, tuple(pad))).lower(x, dy).compile()
        ok = True
    except Exception:
        ok = False

    _probeResults[key] = ok
    return ok
