"""RNN packed-weight interchange with cuDNN-layout checkpoints.

The reference stores RNN weights as cuDNN's opaque packed blob
(/root/reference/Cuda/Source/Libs/CuDnnRnn.c:265 ``getParam`` offsets,
per-gate views carved in /root/reference/Cuda/Backend.py:192-350).  This
module implements the documented legacy cuDNN packed format so reference RNN
checkpoints convert losslessly to this framework's layout and back:

  * all weight MATRICES first, pseudo-layer-major, linLayer order within a
    layer (relu/tanh: [W, R]; LSTM: [Wi Wf Wc Wo | Ri Rf Rc Ro];
    GRU: [Wr Wi Wh | Rr Ri Rh]), each row-major (hsize, input-width);
  * then all BIASES in the same traversal order, (hsize, ) each.

Our native layout interleaves [matrix, bias] per linLayer (see
puzzlelib_tpu/backend/rnn.py RnnDesc.layout).  The converter is validated by
round-trip + named-view agreement tests; true bit-level agreement with a live
cuDNN can only be asserted on NVIDIA hardware, which this environment lacks —
the format above matches cuDNN's documented packing used by every major
framework's cuDNN integration.
"""

import numpy as np

# linLayer gate order per mode: input-projection names then recurrent names
# (mirrors /root/reference/Cuda/Backend.py layerTypes tables)
_GATES = {
    "relu": (("wi", ), ("ri", )),
    "tanh": (("wi", ), ("ri", )),
    "lstm": (("wi", "wf", "wc", "wo"), ("ri", "rf", "rc", "ro")),
    "gru": (("wr", "wi", "wh"), ("rr", "ri", "rh")),
}


def _pseudoLayers(layers, direction):
    return layers * (2 if direction == "bi" else 1)


def _inputWidth(layer, insize, hsize, direction):
    """Input width of a pseudo-layer: raw input for level 0, concatenated
    hidden state for the rest."""
    dirs = 2 if direction == "bi" else 1
    return insize if layer // dirs == 0 else hsize * dirs


def cudnnRnnLayout(mode, insize, hsize, layers, direction="uni"):
    """Yield (layerIndex, paramName, offset, shape) for the cuDNN packed blob;
    matrices for every layer come first, then biases in the same order."""
    inNames, recNames = _GATES[mode]
    entries = []

    offset = 0
    for layer in range(_pseudoLayers(layers, direction)):
        width = _inputWidth(layer, insize, hsize, direction)

        for name in inNames:
            entries.append((layer, name, offset, (hsize, width)))
            offset += hsize * width

        for name in recNames:
            entries.append((layer, name, offset, (hsize, hsize)))
            offset += hsize * hsize

    for layer in range(_pseudoLayers(layers, direction)):
        for name in inNames + recNames:
            entries.append((layer, "b" + name, offset, (hsize, )))
            offset += hsize

    return entries, offset


def convertRnnWeights(flatW, mode, insize, hsize, layers, direction="uni", source="cudnn"):
    """Convert a packed RNN weight blob between layouts.

    source="cudnn": reference checkpoint blob -> this framework's layout.
    source="native": this framework's blob -> cuDNN layout.
    """
    from puzzlelib_tpu.backend.rnn import RnnDesc

    flatW = np.asarray(flatW).ravel()

    desc = RnnDesc(insize, hsize, layers, mode, direction)
    cudnnEntries, cudnnSize = cudnnRnnLayout(mode, insize, hsize, layers, direction)

    assert desc.wsize == cudnnSize, (desc.wsize, cudnnSize)
    assert flatW.size == cudnnSize, (flatW.size, cudnnSize)

    out = np.empty_like(flatW)

    for layer, name, cudnnOffset, shape in cudnnEntries:
        nativeOffset, nativeShape = desc.layout[layer][name]
        count = int(np.prod(shape))

        assert nativeShape == shape, (name, nativeShape, shape)

        if source == "cudnn":
            out[nativeOffset:nativeOffset + count] = flatW[cudnnOffset:cudnnOffset + count]
        elif source == "native":
            out[cudnnOffset:cudnnOffset + count] = flatW[nativeOffset:nativeOffset + count]
        else:
            raise ValueError("Unknown source layout '%s'" % source)

    return out


def convertRnnCheckpoint(hdfPath, outPath, mode, insize, hsize, layers, direction="uni",
                         paramKey=None, source="cudnn"):
    """Rewrite the RNN weight datasets of a reference HDF5 checkpoint in
    place-compatible form: every ``params/<idx>`` dataset whose size matches
    the packed blob (or the one named by ``paramKey``) is converted."""
    import h5py
    import shutil

    shutil.copyfile(hdfPath, outPath)

    _, wsize = cudnnRnnLayout(mode, insize, hsize, layers, direction)

    with h5py.File(outPath, "r+") as hdf:
        grp = hdf["params"]
        keys = [paramKey] if paramKey is not None else list(grp.keys())

        for key in keys:
            blob = np.asarray(grp[key])
            if blob.size == wsize:
                grp[key][...] = convertRnnWeights(
                    blob, mode, insize, hsize, layers, direction, source=source
                ).reshape(blob.shape)

    return outPath
