"""Contrast-normalization demo (reference: /root/reference/TestLib/NormFilters.py)."""

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.modules import SubtractMean, LCN
from puzzlelib_tpu.visual import loadImage, showImage


def main(imagepath="testdata/Bench.png", datapath="testdata/"):
    subtractMean = SubtractMean(size=7)
    lcn = LCN(N=7)

    img = gpuarray.to_gpu(loadImage(imagepath))

    subtractMean(img)
    showImage(subtractMean.data.get(), "%s/ResultSubtractNorm.png" % datapath)

    lcn(img)
    showImage(lcn.data.get(), "%s/ResultLCN.png" % datapath)


if __name__ == "__main__":
    main()
