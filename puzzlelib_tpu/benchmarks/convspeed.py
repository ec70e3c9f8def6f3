"""Conv fwd/bwd-data/bwd-filter benchmark
(reference: /root/reference/Cuda/Benchmarks/ConvSpeed.py - same shapes).

Prints per-direction timings and effective TFLOP/s on the current device.
"""

import numpy as np


def main(datashape=(128, 32, 64, 64), Wshape=(64, 32, 11, 11), stride=1, pad=0):
    from puzzlelib_tpu.backend.dnn import convNdbenchmark
    from puzzlelib_tpu.benchmarks import enableCompileCache

    enableCompileCache()

    nd = len(datashape) - 2
    stride, pad, dilation = (stride, ) * nd, (pad, ) * nd, (1, ) * nd

    fwdResults, bwdParamsResults, bwdDataResults = convNdbenchmark(
        datashape, Wshape, stride, pad, dilation, groups=1
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
    main()
