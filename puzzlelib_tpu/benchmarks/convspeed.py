"""Conv fwd/bwd-data/bwd-filter benchmark
(reference: /root/reference/Cuda/Benchmarks/ConvSpeed.py - same shapes).

Prints per-direction timings and effective TFLOP/s on the current device.
"""

import numpy as np


def chainRate(datashape=(128, 32, 64, 64), Wshape=(64, 32, 11, 11), pad=0,
              reps=(8, 40)):
    """Kernel-rate mode: honest per-op marginals (scan chains, min-of-k
    fenced calls, rep differencing, ARRAY filter deltas - see
    benchmarks.timing for why anything less reads relay overhead or XLA's
    algebraic hoisting instead of the kernel).  bf16, fwd/bwd-data/bwd-filter."""
    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu.ops import conv as opsconv
    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime, fence

    n, cin, h, w = datashape
    cout, _, kh, kw = Wshape
    outh, outw = h + 2 * pad - kh + 1, w + 2 * pad - kw + 1
    flops = 2.0 * n * cout * outh * outw * cin * kh * kw

    kx, kw_ = jax.random.split(jax.random.key(0))
    x = (jax.random.normal(kx, datashape, jnp.float32) * 0.1).astype(jnp.bfloat16)
    wgt = (jax.random.normal(kw_, Wshape, jnp.float32) * 0.1).astype(jnp.bfloat16)
    deltas = deltaBank(Wshape, jnp.bfloat16, max(reps))
    fence(x); fence(deltas)

    nd = 2

    # production dispatch is measurement-gated: run the algo race first so
    # the chain below times what a trained-and-optimizeForShape'd net runs
    measured = opsconv.measureAlgoChoice(datashape, Wshape, (1, ) * nd,
                                         (pad, ) * nd, (1, ) * nd, 1)
    if measured:
        print("measured dispatch:", measured)

    before = dict(opsconv.dispatchStats)

    sec = marginalTime(
        lambda i, a, b, d: opsconv._convCore(
            a, b + d[i], (1, ) * nd, (pad, ) * nd, (1, ) * nd, 1),
        (x, wgt, deltas), reps1=reps[0], reps2=reps[1])

    winoRan = opsconv.dispatchStats["winograd"] > before["winograd"]
    print("fwd chain      %.6f secs  %8.2f TFLOP/s (%4.1f%% of bf16 peak)  [%s]"
          % (sec, flops / sec / 1e12, flops / sec / 197e12 * 100,
             "winograd" if winoRan else "xla"))

    # the shapes PARITY quotes as Pallas numbers must actually trace Pallas:
    # a silent probe-compile fallback would otherwise report an XLA time
    # under a Pallas label (docs/kernels.md "Dispatch rule")
    choice = opsconv._algoChoice.get(("fwd", tuple(datashape), tuple(Wshape),
                                      (pad, ) * nd))
    if choice == "winograd" and not winoRan:
        raise AssertionError(
            "winograd-dispatched ConvSpeed shape fell back to XLA - "
            "probe-compile failure or dispatch regression (see logged warning)")

    gradData = (jax.random.normal(kx, (n, cout, outh, outw), jnp.float32) * 0.1).astype(jnp.bfloat16)
    sec = marginalTime(
        lambda i, g, b, d: opsconv.convNdBackwardData(
            g, b + d[i], datashape, (1, ) * nd, (pad, ) * nd, (1, ) * nd, 1),
        (gradData, wgt, deltas), reps1=reps[0], reps2=reps[1])
    bwdFlops = 2.0 * n * cin * h * w * cout * kh * kw   # dgrad covers the full input
    print("bwdData chain  %.6f secs  %8.2f TFLOP/s (%4.1f%% of bf16 peak)"
          % (sec, bwdFlops / sec / 1e12, bwdFlops / sec / 197e12 * 100))

    gradDeltas = deltaBank((n, 8, outw, cout), jnp.bfloat16, max(reps))
    gradN = gradData.transpose(0, 2, 3, 1)

    sec = marginalTime(
        lambda i, a, g, d: opsconv.convNdBackwardParams(
            a, g.at[:, :8].add(d[i]).transpose(0, 3, 1, 2), wgt,
            (1, ) * nd, (pad, ) * nd, (1, ) * nd, 1)[0],
        (x, gradN, gradDeltas), reps1=reps[0], reps2=reps[1])
    print("bwdFilter chain %.6f secs %8.2f TFLOP/s (%4.1f%% of bf16 peak)"
          % (sec, flops / sec / 1e12, flops / sec / 197e12 * 100))


def main(datashape=(128, 32, 64, 64), Wshape=(64, 32, 11, 11), stride=1, pad=0,
         dtype=np.float32):
    from puzzlelib_tpu.backend.dnn import convNdbenchmark
    from puzzlelib_tpu.benchmarks import enableCompileCache

    enableCompileCache()

    nd = len(datashape) - 2
    stride, pad, dilation = (stride, ) * nd, (pad, ) * nd, (1, ) * nd

    fwdResults, bwdParamsResults, bwdDataResults = convNdbenchmark(
        datashape, Wshape, stride, pad, dilation, groups=1, dtype=dtype
    )

    n, cin, h, w = datashape
    cout, _, kh, kw = Wshape
    outh = (h + 2 * pad[0] - kh) // stride[0] + 1
    outw = (w + 2 * pad[1] - kw) // stride[1] + 1

    flops = 2.0 * n * cout * outh * outw * cin * kh * kw

    print("Benchmarking conv data %s W %s" % (datashape, Wshape))

    for name, results in (("fwd", fwdResults), ("bwdFilter", bwdParamsResults), ("bwdData", bwdDataResults)):
        perf = results[0]
        print("%-10s %.6f secs  %8.2f TFLOP/s" % (name, perf.time, flops / perf.time / 1e12))


if __name__ == "__main__":
    import sys
    import ml_dtypes

    from puzzlelib_tpu.benchmarks import enableCompileCache

    if "--chain" in sys.argv:
        enableCompileCache()
        chainRate()
        sys.exit(0)

    dt = np.float32
    if "--dtype" in sys.argv:
        name = sys.argv[sys.argv.index("--dtype") + 1]
        dt = np.dtype(ml_dtypes.bfloat16) if name == "bfloat16" else np.dtype(name)

    main(dtype=dt)
