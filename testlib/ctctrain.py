"""CTC training demo: a reduced Wave2Letter learns a synthetic alignment task.

The reference ships CTC as a hand-written CUDA kernel pair
(/root/reference/Cuda/Kernels/CTC.py:195 log-space alpha/beta) consumed by
Cost/CTC.py and the WaveToLetter zoo net; there is no TestLib script for it,
so this is the missing end-to-end flow: conv1d acoustic model -> CTC loss ->
loss decrease on a learnable task.

Task: random label sequences (vocab 28 + blank) are rendered to "acoustic"
frames by a fixed random embedding, time-stretched 4x with noise; the model
must learn to undo the rendering.  The net reuses the Wave2Letter conv block
(models/nets/wavetoletter.convBlock) at reduced width.

Run:  python testlib/ctctrain.py [steps]
Gate: mean NLL falls below 40% of its initial value.  Measured on-chip curve
(Adam 1e-3): 60.2 -> 34.7 by step 60, crossing the gate around step ~130, so
the default budget is 200 steps (~0.45 s/step eager through the relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = 29          # 28 symbols + blank
BLANK = 0
FEATS = 13          # MFCC-like input channels
LABLEN = 12         # labels per sample
STRETCH = 4         # frames per label
BATCH = 16


def makeBatch(rng, embed):
    labels = rng.randint(1, VOCAB, size=(BATCH, LABLEN)).astype(np.int32)

    # render: embed each label, repeat STRETCH frames, add noise
    frames = embed[labels]                                   # (B, L, FEATS)
    frames = np.repeat(frames, STRETCH, axis=1)              # (B, T, FEATS)
    frames += rng.randn(*frames.shape).astype(np.float32) * 0.1

    data = np.ascontiguousarray(frames.transpose(0, 2, 1))   # (B, FEATS, T)

    lengths = np.full((BATCH, ), LABLEN, dtype=np.int32)
    flat = labels.reshape(-1)                                # concatenated per sample
    return data, flat, lengths


def buildNet():
    from puzzlelib_tpu.containers import Sequential
    from puzzlelib_tpu.modules import Conv1D
    from puzzlelib_tpu.models.nets.wavetoletter import convBlock

    net = Sequential(name="w2l-mini")
    net.extend(convBlock(FEATS, 128, 11, 2, 5, 0.0, "he", name="c1"))
    net.extend(convBlock(128, 128, 11, 1, 5, 0.0, "he", name="c2"))
    net.extend(convBlock(128, 256, 1, 1, 0, 0.0, "he", name="c3"))
    net.append(Conv1D(256, VOCAB, 1, useBias=True, initscheme="gaussian", wscale=0.01, name="out"))

    return net


def main(steps=200):
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()                 # remote TPU compiles take minutes cold

    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.cost import CTC
    from puzzlelib_tpu.optimizers import Adam

    rng = np.random.RandomState(7)
    embed = rng.randn(VOCAB, FEATS).astype(np.float32)

    np.random.seed(7)
    net = buildNet()

    optimizer = Adam(alpha=1e-3)
    optimizer.setupOn(net, useGlobalState=False)

    cost = CTC(blank=BLANK, vocabsize=VOCAB)

    T = LABLEN * STRETCH // 2                                # conv stride 2
    datalen = np.full((BATCH, ), T, dtype=np.int32)

    first = None
    start = time.time()

    for step in range(1, steps + 1):
        data, labels, lengths = makeBatch(rng, embed)

        out = net(gpuarray.to_gpu(data))                     # (B, VOCAB, T)

        # CTC wants (T, B, V)
        from puzzlelib_tpu.backend.memory import moveaxis
        scores = moveaxis(out, 2, 0)                         # (B, V, T) -> (T, B, V)

        error, grad = cost(
            (scores, gpuarray.to_gpu(datalen)),
            (gpuarray.to_gpu(labels), gpuarray.to_gpu(lengths)),
        )

        # route dL/dscores back to the net's (B, V, T) output layout
        netGrad = moveaxis(grad, 0, 2)

        optimizer.zeroGradParams()
        net.backward(netGrad, updGrad=False)
        optimizer.update()
        net.reset()

        if first is None:
            first = float(error)

        if step % 10 == 0 or step == 1:
            print("step %3d: ctc nll %.4f (%.1fs)" % (step, float(error), time.time() - start),
                  flush=True)

    final = float(error)
    print("CTC nll %.4f -> %.4f (%.1f%%) in %.1fs"
          % (first, final, 100.0 * final / first, time.time() - start))
    assert final < 0.4 * first, "CTC did not learn: %.4f -> %.4f" % (first, final)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
