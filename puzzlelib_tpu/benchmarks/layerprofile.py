"""Per-layer train-step profile: where the milliseconds go.

The TPU answer to the reference's ConvPerf/OptimizeNet records
(/root/reference/TestLib/OptimizeNet.py:29-37, Cuda/Backend.py:146-168):
walk a net's leaf modules with their real intermediate shapes, time each
leaf's forward / backward-data / backward-params as chained jitted programs
(relay-honest methodology: reps inside ONE program, readback fence), and
print a table of time, FLOPs, achieved TFLOP/s and share of the measured
whole-step time.

Chains are deduplicated by (module type, shape, dtype) signature so a VGG-16
profile compiles ~20 small programs, not 3x40.

Run: python -m puzzlelib_tpu.benchmarks.netspeed --net vgg16 --dtype bfloat16 --profile
"""

import time

import numpy as np


BF16_PEAK = 197e12


def _leafModules(mod, prefix=""):
    """(path, module) leaves in execution order (containers recursed)."""
    from puzzlelib_tpu.containers.container import Container
    from puzzlelib_tpu.containers.sequential import Sequential
    from puzzlelib_tpu.containers.parallel import Parallel

    name = mod.name or type(mod).__name__
    path = "%s/%s" % (prefix, name) if prefix else name

    if isinstance(mod, (Sequential, Parallel)):
        out = []
        for child in mod.graph:
            out.extend(_leafModules(child, path))
        return out

    if isinstance(mod, Container):
        out = []
        for child in mod.modules.values():
            out.extend(_leafModules(child, path))
        return out

    return [(path, mod)]


def _flopsOf(mod, inshape, outshape):
    """Forward-pass MXU FLOPs for the types where they are well-defined."""
    kind = type(mod).__name__

    if kind.startswith("Conv") or kind.startswith("Deconv"):
        w = mod.W.shape
        spatial = int(np.prod(outshape[2:] if kind.startswith("Conv") else inshape[2:]))
        batch = inshape[0]
        # W is (co, cpg, *k) for conv, (ci, opg, *k) for deconv
        return 2.0 * batch * spatial * int(np.prod(w))

    if kind == "Linear":
        return 2.0 * inshape[0] * int(np.prod(mod.W.shape))

    if kind == "GroupLinear" and mod.W is not None:
        # every group multiplies the batch regardless of wmode sharing, and
        # batchDim=1 layouts put the group axis first
        batch = inshape[0] if mod.groupDim != 0 else inshape[1]
        rows, cols = mod.W.shape[-2], mod.W.shape[-1]
        return 2.0 * batch * mod.groups * rows * cols

    return None


def _profileLeaf(mod, inArr, gradArr, reps, iters):
    """(fwd, fwd+bwdData, fwd+bwdData+bwdParams) honest marginal seconds.

    Array-delta perturbation on an input slice (scalar perturbations let XLA
    hoist linear ops out of the chain) + rep-differenced min-of-k timing
    (see benchmarks.timing)."""
    import jax.numpy as jnp
    from puzzlelib_tpu.tensor import GPUArray
    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime

    hasParams = len(mod.vars) > 0

    reps2 = max(reps * 3, reps + 8)
    rows = min(8, inArr.shape[1]) if inArr.ndim > 1 else min(8, inArr.shape[0])
    deltas = deltaBank((rows, ) + inArr.shape[2:] if inArr.ndim > 1 else (rows, ),
                       inArr.dtype, reps2)

    def perturb(x, i, d):
        # index the TRACED bank operand, never the concrete closure: a
        # closed-over `deltas` rides as an MLIR constant (~MBs for 224x224
        # layers) and the relay rejects the payload with HTTP 413
        # (tools/remeasure_bench.py documents the same pitfall)
        if x.ndim > 1:
            return x.at[:, :rows].add(d[i])
        return x.at[:rows].add(d[i])

    # the module's params/attrs ride as TRACED chain operands, rebound into
    # the root buffers at trace time: a closure capture would embed every
    # weight tensor as an MLIR constant in the compile payload (the relay
    # rejects conv/Linear layer chains with HTTP 413)
    from puzzlelib_tpu.fused import collectStateBuffers
    roots = collectStateBuffers(mod)
    snapshot = [r.jax for r in roots]

    def bindState(state):
        for root, s in zip(roots, state):
            root._write(s)

    def fwd(i, x, g, d, *state):
        bindState(state)
        out = mod(GPUArray(perturb(x, i, d)))
        mod.reset()
        return out.jax

    def fwdBwd(i, x, g, d, *state):
        bindState(state)
        out = mod(GPUArray(perturb(x, i, d)))
        mod.updateGrad(GPUArray(g))
        grad = mod.grad
        mod.reset()

        # consume the FORWARD output too: many layers' updateGrad doesn't
        # read it (conv bwd-data needs only grad+W), and an unconsumed
        # forward is dead code XLA deletes - the chain would time bwd alone
        return jnp.max(grad.jax.astype(jnp.float32)) + jnp.max(out.jax.astype(jnp.float32))

    def fwdBwdParams(i, x, g, d, *state):
        bindState(state)
        out = mod(GPUArray(perturb(x, i, d)))
        gw = GPUArray(g)
        mod.updateGrad(gw)
        mod.accGradParams(gw)
        grad = mod.grad

        # fold the forward output and every param grad into the consumed
        # scalar: any result-unused pass is dead code XLA silently deletes,
        # and its column would time nothing
        s = jnp.max(grad.jax.astype(jnp.float32)) + jnp.max(out.jax.astype(jnp.float32))
        for var in mod.vars.values():
            if var.grad is not None:
                s = s + jnp.max(var.grad.jax.astype(jnp.float32))

        mod.reset()
        return s

    # the chains write tracers through module/grad buffers at trace time;
    # restore the concrete roots after every trace or the next trace reads
    # a leaked tracer (accGradParams ACCUMULATES into var.grad)
    def restore():
        for root, saved in zip(roots, snapshot):
            root._write(saved)
        mod.reset()

    ops = (inArr, gradArr, deltas) + tuple(snapshot)
    k = max(2, iters + 1)
    tF = marginalTime(fwd, ops, reps1=reps, reps2=reps2, k=k, restore=restore)
    tFB = marginalTime(fwdBwd, ops, reps1=reps, reps2=reps2, k=k, restore=restore)
    tFBP = marginalTime(fwdBwdParams, ops, reps1=reps, reps2=reps2, k=k,
                        restore=restore) if hasParams else tFB

    return max(tF, 0.0), max(tFB, tF), max(tFBP, tFB)


def profileNet(net, data, stepSecs=None, reps=8, iters=2, out=print):
    """Print the per-layer table for one train step of ``net`` on ``data``.

    ``stepSecs`` (optional): measured whole-step seconds for the %-of-step
    column and the unattributed remainder line."""
    import jax.numpy as jnp
    from puzzlelib_tpu.backend import gpuarray
    from puzzlelib_tpu.tensor import GPUArray

    # recording forward: leaves keep .inData/.data shapes afterwards
    net(gpuarray.to_gpu(data))

    leaves = _leafModules(net)

    rows = []
    cache = {}        # (type, inshape, outshape, dtype) -> timings

    for path, mod in leaves:
        inData, outData = mod.inData, mod.data

        if not isinstance(inData, GPUArray) or not isinstance(outData, GPUArray):
            rows.append((path, mod, None, None, None))     # list-valued io: skip
            continue

        sig = (type(mod).__name__, inData.shape, outData.shape, str(inData.dtype))

        if sig not in cache:
            x = jnp.asarray(np.random.randn(*inData.shape) * 0.1, inData.jax.dtype)
            g = jnp.asarray(np.random.randn(*outData.shape) * 0.1, outData.jax.dtype)

            # _profileLeaf restores roots itself between chains; this outer
            # snapshot/restore is deliberate belt-and-braces for the exception
            # path (a chain that raises mid-trace leaves tracers in the roots
            # before marginalTime's restore callback ever runs)
            from puzzlelib_tpu.fused import collectStateBuffers
            roots = collectStateBuffers(mod)
            snapshot = [r.jax for r in roots]

            try:
                # one retry: the relay's remote-compile helper 500s
                # transiently under load, and a single flaky probe should
                # not blank the row for the whole run
                for attempt in (0, 1):
                    try:
                        cache[sig] = _profileLeaf(mod, x, g, reps, iters)
                        break
                    except Exception as exc:
                        cache[sig] = exc
                        for root, saved in zip(roots, snapshot):
                            root._write(saved)
                        mod.reset()
            finally:
                for root, saved in zip(roots, snapshot):
                    root._write(saved)

        rows.append((path, mod, inData.shape, outData.shape, cache[sig]))

    net.reset()

    # -- report -------------------------------------------------------------

    isBf16 = "bfloat16" in str(data.dtype)
    out("%-44s %18s %9s %9s %9s %8s %6s %6s" % (
        "layer", "out shape", "fwd us", "bwdD us", "bwdP us", "TF/s", "%peak", "%step"))

    totF = totBD = totBP = 0.0
    for path, mod, inshape, outshape, t in rows:
        shapeStr = "x".join(map(str, outshape)) if outshape else "-"

        if t is None:
            out("%-44s %18s %9s" % (path[-44:], shapeStr[-18:], "(skip)"))
            continue
        if isinstance(t, Exception):
            out("%-44s %18s  FAILED: %s" % (path[-44:], shapeStr[-18:], str(t)[:60]))
            continue

        tF, tFB, tFBP = t
        bwdD, bwdP = max(0.0, tFB - tF), max(0.0, tFBP - tFB)
        totF += tF
        totBD += bwdD
        totBP += bwdP

        flops = _flopsOf(mod, inshape, outshape)
        layerTotal = tF + bwdD + bwdP
        if flops and layerTotal <= 0.0:
            # every marginal measured <= 0: the layer is below the relay's
            # rep-differencing noise floor
            tfsStr, peakPct = "   noise", "    -"
        elif flops:
            # fwd + bwdData + bwdFilter each cost ~`flops`
            dirs = 1 + (1 if bwdD > 0 else 0) + (1 if bwdP > 0 else 0)
            tfs = flops * dirs / layerTotal / 1e12
            if isBf16 and tfs * 1e12 > BF16_PEAK:
                # a marginal above peak is physically impossible: the
                # rep-differenced delta undershot the layer's true time
                # (relay noise dominates sub-ms rows) - flag, don't report
                tfsStr, peakPct = "   noise", "    -"
            else:
                peakPct = "%5.1f" % (tfs * 1e12 / BF16_PEAK * 100) if isBf16 else "    -"
                tfsStr = "%8.2f" % tfs
        else:
            tfsStr, peakPct = "       -", "    -"

        stepPct = "%5.1f" % (layerTotal / stepSecs * 100) if stepSecs else "    -"

        out("%-44s %18s %9.1f %9.1f %9.1f %s %s %s" % (
            path[-44:], shapeStr[-18:], tF * 1e6, bwdD * 1e6, bwdP * 1e6,
            tfsStr, peakPct, stepPct))

    attributed = totF + totBD + totBP
    out("%-44s %18s %9.1f %9.1f %9.1f" % (
        "TOTAL (sum of layers)", "", totF * 1e6, totBD * 1e6, totBP * 1e6))

    if stepSecs:
        out("measured fused step: %.1f us; sum of isolated layer chains: %.1f us "
            "(%.0f%%)" % (stepSecs * 1e6, attributed * 1e6,
                          attributed / stepSecs * 100))
        out("NOTE: rows time each layer as a standalone program - an upper "
            "bound per layer, not an additive decomposition (the fused step "
            "fuses elementwise/pool passes into neighboring convs, so the "
            "isolated sum exceeds the step). The additive accounting of the "
            "fused step is the XLA-trace stage/role table "
            "(tools/steptrace.py; docs/kernels.md 'where the milliseconds "
            "go'), which sums to 100% by construction.")

    return rows
