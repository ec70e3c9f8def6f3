"""Wave2Letter CTC ASR net (reference: /root/reference/Models/Nets/WaveToLetter.py)."""

from puzzlelib_tpu.containers import Sequential
from puzzlelib_tpu.modules import Conv1D, BatchNorm1D, Dropout, Activation, clip, Pad1D


def convBlock(inmaps, outmaps, size, stride, pad, dropout, initscheme, dilation=1, bnAct=True, name=None):
    block = Sequential()

    if pad > 0:
        block.append(Pad1D(pad, mode="reflect"))

    block.append(Conv1D(
        inmaps, outmaps, size=size, stride=stride, pad=0, dilation=dilation, useBias=True,
        initscheme=initscheme, name="%s_conv" % name
    ))

    if bnAct:
        block.append(BatchNorm1D(outmaps, epsilon=0.001, name="%s_bn" % name))
        block.append(Activation(clip, args=(0.0, 20.0)))

    if dropout > 0.0:
        block.append(Dropout(p=dropout))

    return block


# (inmaps, outmaps, size, stride, pad, dropout, dilation, bnAct)
_LAYOUT = [
    (None, 256, 11, 2, 5, 0.2, 1, True),
    (256, 256, 11, 1, 5, 0.2, 1, True), (256, 256, 11, 1, 5, 0.2, 1, True), (256, 256, 11, 1, 5, 0.2, 1, True),
    (256, 384, 13, 1, 6, 0.2, 1, True), (384, 384, 13, 1, 6, 0.2, 1, True), (384, 384, 13, 1, 6, 0.2, 1, True),
    (384, 512, 17, 1, 8, 0.2, 1, True), (512, 512, 17, 1, 8, 0.2, 1, True), (512, 512, 17, 1, 8, 0.2, 1, True),
    (512, 640, 21, 1, 10, 0.3, 1, True), (640, 640, 21, 1, 10, 0.3, 1, True), (640, 640, 21, 1, 10, 0.3, 1, True),
    (640, 768, 25, 1, 12, 0.3, 1, True), (768, 768, 25, 1, 12, 0.3, 1, True), (768, 768, 25, 1, 12, 0.3, 1, True),
    (768, 896, 29, 1, 28, 0.4, 2, True),
    (896, 1024, 1, 1, 0, 0.4, 1, True),
    (1024, None, 1, 1, 0, 0.0, 1, False),
]


def loadW2L(modelpath, inmaps, nlabels, initscheme=None, name="w2l"):
    net = Sequential(name=name)

    for i, (inm, outm, size, stride, pad, dropout, dilation, bnAct) in enumerate(_LAYOUT):
        inm = inmaps if inm is None else inm
        outm = nlabels if outm is None else outm

        net.extend(convBlock(
            inm, outm, size=size, stride=stride, pad=pad, dropout=dropout, initscheme=initscheme,
            dilation=dilation, bnAct=bnAct, name="conv1d_%d" % i
        ))

    if modelpath is not None:
        net.load(modelpath)

    return net
