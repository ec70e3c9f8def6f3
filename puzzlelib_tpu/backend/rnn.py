"""Recurrent layers: relu/tanh/LSTM/GRU x uni/bi x multi-layer with dropout.

TPU-native replacement for the cuDNN RNN binding
(/root/reference/Cuda/Source/Libs/CuDnnRnn.c, param carving
/root/reference/Cuda/Backend.py:192-350): the same packed flat weight blob +
named per-gate views API, but compute is a jitted ``lax.scan`` per layer with
the gate GEMMs batched over time (one big MXU matmul for all input
projections, a scanned (B,H)x(H,H) matmul for the recurrent part).

Cell equations follow cuDNN:
  relu/tanh: h_t = act(W x + bw + R h + br)
  LSTM: i,f,o = sigma(...), c' = tanh(...); c = f*c + i*c'; h = o*tanh(c)
  GRU:  r,u = sigma(...); h' = tanh(Wh x + bwh + r*(Rh h + brh));
        h = (1-u)*h' + u*h

Backward passes are VJPs of the forward (one recompute; the fused training
path differentiates straight through instead).

The flat-weight layout is self-defined (interleaved [W, bias] per cuDNN
linLayer, layer-major); reference HDF5 checkpoints of RNN weights use cuDNN's
packed layout — convert with
``puzzlelib_tpu.converter.rnnweights.convertRnnWeights`` /
``convertRnnCheckpoint`` (tested round-trip + per-gate-view agreement).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from puzzlelib_tpu.tensor import GPUArray


_LINLAYERS = {
    "relu": (("wi", ), ("ri", )),
    "tanh": (("wi", ), ("ri", )),
    "lstm": (("wi", "wf", "wc", "wo"), ("ri", "rf", "rc", "ro")),
    "gru": (("wr", "wi", "wh"), ("rr", "ri", "rh")),
}


class RnnDesc:
    def __init__(self, insize, hsize, layers, mode, direction, dropout=0.0, seed=0, batchsize=0):
        self.insize, self.hsize, self.layers = insize, hsize, layers
        self.mode, self.direction = mode, direction
        self.dropout, self.seed = dropout, seed
        self.batchsize = batchsize

        self.dirs = 2 if direction == "bi" else 1
        self.pseudoLayers = layers * self.dirs

        self._counter = 0
        self.layout = []  # per pseudo-layer: {name: (offset, shape)}

        offset = 0
        inW, recW = _LINLAYERS[mode]

        for layer in range(self.pseudoLayers):
            level = layer // self.dirs
            size = insize if level == 0 else hsize * self.dirs

            entry = {}
            for name in inW:
                entry[name] = (offset, (hsize, size))
                offset += hsize * size
                entry["b" + name] = (offset, (hsize, ))
                offset += hsize

            for name in recW:
                entry[name] = (offset, (hsize, hsize))
                offset += hsize * hsize
                entry["b" + name] = (offset, (hsize, ))
                offset += hsize

            self.layout.append(entry)

        self.wsize = offset

    # -- param views ---------------------------------------------------------

    def acquireParams(self, W):
        params = []
        for entry in self.layout:
            layerparams = {}
            for name, (offset, shape) in entry.items():
                size = int(np.prod(shape))
                layerparams[name] = W[offset:offset + size].reshape(shape)

            params.append(layerparams)

        return params

    # -- compute -------------------------------------------------------------

    def _nextKey(self):
        # The key must come from the global RNG facade: under a FusedStep trace
        # it pulls a per-step key from fusedctx, so the traced step folds in a
        # fresh dropout mask each iteration instead of constant-folding one.
        from puzzlelib_tpu.rng import globalRng

        self._counter += 1
        return jax.random.fold_in(globalRng.nextKey(), self._counter)

    def forward(self, data, W, test=False, allocator=None):
        key = jax.random.key(self.seed) if test or self.dropout == 0.0 else self._nextKey()

        # stash what cuDNN would keep in its reserve space: the VJP inputs
        self._lastKey = key
        self._lastInput = data.jax
        self._lastW = W.jax
        self._lastDropout = 0.0 if test else self.dropout

        out = _rnnForward(
            data.jax, W.jax, key,
            self.insize, self.hsize, self.layers, self.mode, self.direction, self._lastDropout,
        )

        if test:
            return GPUArray(out)

        reserve = GPUArray(jnp.zeros((1, ), jnp.float32))  # placeholder (VJP recomputes)
        return GPUArray(out), reserve

    def backwardData(self, grad, outdata, W, reserve, allocator=None):
        self._lastGrad = grad.jax

        dx = _rnnBackwardData(
            self._lastInput, W.jax, self._lastKey, grad.jax,
            self.insize, self.hsize, self.layers, self.mode, self.direction, self._lastDropout,
        )
        return GPUArray(dx)

    def backwardParams(self, data, outdata, reserve, allocator=None):
        dw = _rnnBackwardParams(
            data.jax, self._lastW, self._lastKey, self._lastGrad,
            self.insize, self.hsize, self.layers, self.mode, self.direction, self._lastDropout,
        )
        return GPUArray(dw)


def _carve(W, offset, shape):
    size = int(np.prod(shape))
    return jax.lax.dynamic_slice(W, (offset, ), (size, )).reshape(shape)


def _layerParams(W, desc_layout_entry):
    return {name: _carve(W, off, shape) for name, (off, shape) in desc_layout_entry.items()}


def _buildLayout(insize, hsize, layers, mode, direction):
    desc = RnnDesc(insize, hsize, layers, mode, direction)
    return desc.layout


def _cellScan(mode, xproj, p, h0, hsize, reverse):
    """Scan over time. xproj: (T, B, G*H) precomputed input projections + biases."""

    if mode in ("relu", "tanh"):
        act = jnp.tanh if mode == "tanh" else lambda v: jnp.maximum(v, 0)
        Ri, bri = p["ri"], p["bri"]

        def step(h, xp):
            h = act(xp + h @ Ri.T + bri)
            return h, h

        _, hs = jax.lax.scan(step, h0, xproj, reverse=reverse)
        return hs

    if mode == "lstm":
        R = jnp.concatenate([p["ri"], p["rf"], p["rc"], p["ro"]], axis=0)      # (4H, H)
        br = jnp.concatenate([p["bri"], p["brf"], p["brc"], p["bro"]])

        def step(carry, xp):
            h, c = carry
            z = xp + h @ R.T + br
            i, f, g, o = jnp.split(z, 4, axis=-1)

            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)

            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        _, hs = jax.lax.scan(step, (h0, jnp.zeros_like(h0)), xproj, reverse=reverse)
        return hs

    if mode == "gru":
        Rr, Ru, Rh = p["rr"], p["ri"], p["rh"]
        brr, bru, brh = p["brr"], p["bri"], p["brh"]

        def step(h, xp):
            xr, xu, xh = jnp.split(xp, 3, axis=-1)

            r = jax.nn.sigmoid(xr + h @ Rr.T + brr)
            u = jax.nn.sigmoid(xu + h @ Ru.T + bru)
            hh = jnp.tanh(xh + r * (h @ Rh.T + brh))

            h = (1 - u) * hh + u * h
            return h, h

        _, hs = jax.lax.scan(step, h0, xproj, reverse=reverse)
        return hs

    raise NotImplementedError(mode)


def _rnnCore(x, W, key, insize, hsize, layers, mode, direction, dropout):
    T, B = x.shape[0], x.shape[1]
    dirs = 2 if direction == "bi" else 1

    layout = _buildLayout(insize, hsize, layers, mode, direction)
    inNames, recNames = _LINLAYERS[mode]

    current = x.astype(jnp.float32)

    for level in range(layers):
        outs = []
        for d in range(dirs):
            p = _layerParams(W.astype(jnp.float32), layout[level * dirs + d])

            Wx = jnp.concatenate([p[n] for n in inNames], axis=0)            # (G*H, in)
            bw = jnp.concatenate([p["b" + n] for n in inNames])

            xproj = jnp.einsum("tbi,gi->tbg", current, Wx,
                               preferred_element_type=jnp.float32) + bw

            hs = _cellScan(mode, xproj, p, jnp.zeros((B, hsize), jnp.float32), hsize, reverse=(d == 1))
            outs.append(hs)

        current = outs[0] if dirs == 1 else jnp.concatenate(outs, axis=-1)

        if dropout > 0.0 and level < layers - 1:
            mask = jax.random.bernoulli(jax.random.fold_in(key, level), 1.0 - dropout, current.shape)
            current = current * mask / (1.0 - dropout)

    return current.astype(x.dtype)


@partial(jax.jit, static_argnames=("insize", "hsize", "layers", "mode", "direction", "dropout"))
def _rnnForward(x, W, key, insize, hsize, layers, mode, direction, dropout):
    return _rnnCore(x, W, key, insize, hsize, layers, mode, direction, dropout)


@partial(jax.jit, static_argnames=("insize", "hsize", "layers", "mode", "direction", "dropout"))
def _rnnBackwardData(x, W, key, grad, insize, hsize, layers, mode, direction, dropout):
    _, vjp = jax.vjp(lambda xx: _rnnCore(xx, W, key, insize, hsize, layers, mode, direction, dropout), x)
    return vjp(grad)[0]


@partial(jax.jit, static_argnames=("insize", "hsize", "layers", "mode", "direction", "dropout"))
def _rnnBackwardParams(x, W, key, grad, insize, hsize, layers, mode, direction, dropout):
    _, vjp = jax.vjp(lambda ww: _rnnCore(x, ww, key, insize, hsize, layers, mode, direction, dropout), W)
    return vjp(grad)[0]


# -- backend Dnn-facing API --------------------------------------------------

def createRnn(insize, hsize, layers, mode, direction, dropout=0.0, seed=0, batchsize=None):
    mode = getattr(mode, "value", mode)
    direction = getattr(direction, "value", direction)

    desc = RnnDesc(insize, hsize, layers, mode, direction, dropout, seed, 0 if batchsize is None else batchsize)

    W = GPUArray.zeros((desc.wsize, ), np.float32)
    params = desc.acquireParams(W)

    return desc, W, params


def acquireRnnParams(desc, w):
    return desc.acquireParams(w)


def updateRnnParams(desc, w, params):
    # params are write-through views of w - nothing to copy
    pass
