"""Independent float64 oracle for whole-net forward+backward numerics.

Walks a Module/Container tree and evaluates the same function with torch CPU
ops in float64, with autograd supplying the exact backward.  This is a second
implementation (torch, not jax) of each layer's semantics, so it validates
both the architecture wiring (skips, concat order, strides/padding) and the
accumulated-precision of the production f32 path at the BASELINE 1e-4
tolerance — the whole-net extension of the op-level f64 loop oracles in
test_backend_ops.py.

Covered module types are exactly those the UNet / MiniYolo / WaveToLetter
builders use (reference: Models/Nets/{UNet,MiniYolo,WaveToLetter}.py).
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t64(gpuarr, requires_grad=False):
    return torch.tensor(np.asarray(gpuarr.get(), dtype=np.float64), requires_grad=requires_grad)


class TorchOracle:
    def __init__(self):
        self.params = {}        # (id(module), varname) -> torch leaf tensor
        self.order = []         # (module, varname) in traversal order

    def var(self, mod, name):
        key = (id(mod), name)
        if key not in self.params:
            self.params[key] = _t64(mod.vars[name].data, requires_grad=True)
            self.order.append((mod, name))
        return self.params[key]

    # -- evaluation ---------------------------------------------------------

    def run(self, mod, x):
        kind = type(mod).__name__
        handler = getattr(self, "eval" + kind, None)

        if handler is None:
            raise NotImplementedError("torch oracle: no handler for %s" % kind)

        return handler(mod, x)

    def evalSequential(self, mod, x):
        for child in mod.graph:
            x = self.run(child, x)
        return x

    def evalParallel(self, mod, xs):
        return [self.run(branch, xi) for branch, xi in zip(mod.graph, xs)]

    def evalIdentity(self, mod, x):
        return x

    def evalReplicate(self, mod, x):
        return [x] * mod.times

    def evalConcat(self, mod, xs):
        return torch.cat(xs, dim=mod.axis)

    def evalFlatten(self, mod, x):
        return x.reshape(x.shape[0], -1)

    def evalDropout(self, mod, x):
        assert not mod.train, "oracle runs expect eval-mode dropout (deterministic)"
        return x

    def evalActivation(self, mod, x):
        a = mod.actArgs
        return {
            "relu": lambda: F.relu(x),
            "sigmoid": lambda: torch.sigmoid(x),
            "tanh": lambda: torch.tanh(x),
            "leakyRelu": lambda: F.leaky_relu(x, a[0]),
            "elu": lambda: F.elu(x, a[0]),
            "softPlus": lambda: F.softplus(x),
            "clip": lambda: torch.clamp(x, a[0], a[1]),
        }[mod.activation.value]()

    def evalSoftMax(self, mod, x):
        return F.softmax(x, dim=1)

    def _convBias(self, mod):
        return self.var(mod, "b").reshape(-1) if mod.b is not None else None

    def evalConv1D(self, mod, x):
        return F.conv1d(x, self.var(mod, "W"), self._convBias(mod),
                        stride=mod.stride, padding=mod.pad, dilation=mod.dilation,
                        groups=mod.groups)

    def evalConv2D(self, mod, x):
        return F.conv2d(x, self.var(mod, "W"), self._convBias(mod),
                        stride=mod.stride, padding=mod.pad, dilation=mod.dilation,
                        groups=mod.groups)

    def evalDeconv2D(self, mod, x):
        return F.conv_transpose2d(x, self.var(mod, "W"), self._convBias(mod),
                                  stride=mod.stride, padding=mod.pad,
                                  output_padding=mod.postpad, groups=mod.groups,
                                  dilation=mod.dilation)

    def evalMaxPool2D(self, mod, x):
        return F.max_pool2d(x, mod.size, stride=mod.stride, padding=mod.pad)

    def evalAvgPool2D(self, mod, x):
        return F.avg_pool2d(x, mod.size, stride=mod.stride, padding=mod.pad,
                            count_include_pad=mod.includePad)

    def evalLinear(self, mod, x):
        W = self.var(mod, "W")
        out = x @ (W.t() if mod.transpose else W)
        if mod.useBias:
            out = out + self.var(mod, "b")
        return out

    def _batchNorm(self, mod, x):
        scale, bias = self.var(mod, "scale"), self.var(mod, "bias")
        runMean = _t64(mod.vars["mean"].data if "mean" in mod.vars else mod.mean)
        runVar = _t64(mod.vars["var"].data if "var" in mod.vars else mod.var)
        return F.batch_norm(
            x, runMean.reshape(-1), runVar.reshape(-1),
            weight=scale.reshape(-1), bias=bias.reshape(-1),
            training=mod.train, momentum=0.0, eps=mod.epsilon,
        )

    evalBatchNorm1D = _batchNorm
    evalBatchNorm2D = _batchNorm
    evalBatchNorm3D = _batchNorm

    def evalPad1D(self, mod, x):
        lpad, rpad = mod.pad
        mode = mod.mode.value
        return F.pad(x, (lpad, rpad), mode="constant" if mode == "constant" else mode,
                     value=getattr(mod, "fillValue", 0.0) if mode == "constant" else 0.0)


def checkNetAgainstOracle(net, data, seed=0, rtol=1e-4, checkParamGrads=True,
                          absFloor=1e-2):
    """Run forward+backward through the production eager path (f32) and the
    torch f64 oracle; compare output, input gradient, and every param grad.

    Returns (maxOutErr, maxGradErr) relative errors for reporting."""
    from puzzlelib_tpu.backend import gpuarray

    rng = np.random.RandomState(seed)

    out = net(gpuarray.to_gpu(data))
    outGrad = rng.randn(*out.shape).astype(np.float32)
    net.backward(gpuarray.to_gpu(outGrad))

    oracle = TorchOracle()
    x = torch.tensor(data.astype(np.float64), requires_grad=True)
    outT = oracle.run(net, x)
    outT.backward(torch.tensor(outGrad.astype(np.float64)))

    def relErr(a, b):
        scale = max(1e-3, float(np.abs(b).max()))
        return float(np.abs(np.asarray(a, np.float64) - b).max()) / scale

    outErr = relErr(out.get(), outT.detach().numpy())
    gradErr = relErr(net.grad.get(), x.grad.numpy())

    assert outErr < rtol, "forward mismatch: rel err %g" % outErr
    assert gradErr < rtol, "input-grad mismatch: rel err %g" % gradErr

    if checkParamGrads:
        wants = {key: (t.grad.numpy() if t.grad is not None else None)
                 for key, t in oracle.params.items()}
        assert all(w is not None for w in wants.values()), "oracle grads missing"

        # Some param grads are *mathematically* zero by architecture (a conv
        # bias feeding a train-mode BatchNorm is shift-invariant), leaving both
        # sides pure cancellation noise — a self-relative check would compare
        # noise to noise.  Anchor the absolute term on the net's global
        # gradient scale instead: wiring bugs produce O(globalScale) errors.
        globalScale = max(float(np.abs(w).max()) for w in wants.values())

        for mod, name in oracle.order:
            got = np.asarray(mod.vars[name].grad.get(), np.float64)
            want = wants[(id(mod), name)]
            err = float(np.abs(got - want).max())

            # the absolute floor absorbs two benign f32-vs-f64 effects that
            # scale with depth/size, not with the param's own grad: summand
            # cancellation noise in mathematically-zero grads, and
            # LeakyReLU/ReLU boundary flips in deep nets (a unit within f32
            # noise of the kink takes different branches in the two
            # frameworks).  Wiring bugs produce O(globalScale) errors, so
            # even the widest caller floor (5e-2 for 24-layer MiniYolo)
            # keeps 20x headroom.
            tol = rtol * float(np.abs(want).max()) + absFloor * globalScale
            assert err < tol, "param grad mismatch %s.%s: abs err %g (tol %g)" % (
                mod, name, err, tol)

    return outErr, gradErr
