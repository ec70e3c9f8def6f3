"""Pipeline parallelism over a mesh "stage" axis.

The reference has no pipeline parallelism (its only distribution mode is the
CUDA-IPC data-parallel grid, /root/reference/Grid.py); this is the TPU-native
extension: a GPipe-style microbatch schedule expressed as pure SPMD —
``shard_map`` splits a stack of identical stage parameters over the mesh's
stage axis, a ``lax.scan`` steps the schedule, and ``lax.ppermute`` hands
activations to the next stage over ICI. Nothing is host-driven: the whole
pipeline (forward, backward via autodiff through the scan, optimizer-ready
grads) is ONE compiled XLA program.

Usage (see tests/test_pipeline.py):

    stacked = stack_stage_params([p0, p1, p2, p3])       # leading stage axis
    out = pipelineForward(blockFn, stacked, x, mesh, "stage", microbatches=8)
    loss, grads = pipelineGrad(blockFn, lossFn, stacked, x, target, ...)

``blockFn(params, x) -> y`` is one stage's computation (stages must share
structure/shapes — the transformer-block regime pipeline parallelism targets).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map            # jax >= 0.8 (check_vma kwarg)

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)

except ImportError:                                    # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def stackStageParams(paramsList):
    """Stack per-stage parameter pytrees along a new leading stage axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *paramsList)


def _schedule(blockFn, stageParams, microbatches, nStages, stageAxis):
    """Run the GPipe schedule inside shard_map: every device holds one stage's
    params (leading axis 1 locally) and a rolling activation buffer."""
    myStage = lax.axis_index(stageAxis)

    nMicro = microbatches.shape[0]
    steps = nMicro + nStages - 1

    mbShape = microbatches.shape[1:]
    localParams = jax.tree.map(lambda p: p[0], stageParams)

    right = [(i, (i + 1) % nStages) for i in range(nStages)]

    def step(carry, t):
        buf, outs = carry

        # stage 0 ingests microbatch t (dummy zeros once drained)
        mb = lax.dynamic_index_in_dim(
            microbatches, jnp.minimum(t, nMicro - 1), axis=0, keepdims=False
        )
        buf = jnp.where(myStage == 0, mb, buf)

        # every stage computes on its current slot
        y = blockFn(localParams, buf)

        # last stage records its result at output slot t - (nStages - 1)
        outIdx = t - (nStages - 1)
        validOut = jnp.logical_and(outIdx >= 0, myStage == nStages - 1)
        outs = lax.cond(
            validOut,
            lambda o: lax.dynamic_update_index_in_dim(o, y, jnp.maximum(outIdx, 0), axis=0),
            lambda o: o,
            outs,
        )

        # hand activations to the next stage over ICI
        buf = lax.ppermute(y, stageAxis, perm=right)

        return (buf, outs), None

    outShape = jax.eval_shape(lambda p, xx: blockFn(p, xx), localParams,
                              jax.ShapeDtypeStruct(mbShape, microbatches.dtype))
    if outShape.shape != mbShape or outShape.dtype != microbatches.dtype:
        raise ValueError(
            "Pipeline stages must preserve activation shape/dtype (%s%s -> %s%s)" %
            (mbShape, microbatches.dtype, outShape.shape, outShape.dtype)
        )

    buf0 = jnp.zeros(mbShape, microbatches.dtype)
    outs0 = jnp.zeros((nMicro, ) + mbShape, microbatches.dtype)

    (buf, outs), _ = lax.scan(step, (buf0, outs0), jnp.arange(steps))

    # only the last stage ever records outputs (all other shards kept zeros),
    # so a psum over the stage axis replicates them everywhere
    return lax.psum(outs, stageAxis)


def _splitMicro(x, microbatches):
    batch = x.shape[0]
    if batch % microbatches != 0:
        raise ValueError("Batch %d not divisible into %d microbatches" % (batch, microbatches))

    return x.reshape((microbatches, batch // microbatches) + x.shape[1:])


def _rawForward(blockFn, stackedParams, mb, mesh, stageAxis):
    nStages = mesh.shape[stageAxis]
    paramSpec = jax.tree.map(lambda _: P(stageAxis), stackedParams)

    fn = shard_map(
        functools.partial(_schedule, blockFn, nStages=nStages, stageAxis=stageAxis),
        mesh,
        (paramSpec, P()),
        P(),
    )

    outs = fn(stackedParams, mb)
    return outs.reshape((outs.shape[0] * outs.shape[1], ) + outs.shape[2:])


# whole-schedule executables, keyed on (blockFn, lossFn, mesh, stageAxis): the
# schedule is one jitted XLA program per signature, so a training loop pays
# trace/compile once, not per step (shapes re-key via jit's own cache)
_jitCache = {}


def _jittedFor(kind, blockFn, lossFn, mesh, stageAxis):
    key = (kind, id(blockFn), id(lossFn), mesh, stageAxis)
    fn = _jitCache.get(key)

    if fn is None:
        if kind == "forward":
            def fn(stackedParams, mb):
                return _rawForward(blockFn, stackedParams, mb, mesh, stageAxis)
        else:
            def lossOf(params, mb, target):
                out = _rawForward(blockFn, params, mb, mesh, stageAxis)
                return lossFn(out, target)

            def fn(stackedParams, mb, target):
                return jax.value_and_grad(lossOf)(stackedParams, mb, target)

        fn = jax.jit(fn)
        # keep id()-keyed entries alive only while their callables are:
        # pin the callables on the cache entry
        _jitCache[key] = fn
        fn._pins = (blockFn, lossFn)

    return fn


def pipelineForward(blockFn, stackedParams, x, mesh, stageAxis="stage", microbatches=4):
    """Forward through ``nStages`` pipelined stages; returns (B, ...) output.

    ``stackedParams`` leaves have leading dim nStages (sharded over the stage
    axis); ``x`` is the full (replicated) batch, split into ``microbatches``.
    """
    mb = _splitMicro(x, microbatches)
    return _jittedFor("forward", blockFn, None, mesh, stageAxis)(stackedParams, mb)


def pipelineGrad(blockFn, lossFn, stackedParams, x, target, mesh, stageAxis="stage", microbatches=4):
    """(loss, grads) of mean loss over the pipelined forward — one XLA program.

    Autodiff runs backward through the scan and the ppermutes, which is
    exactly the reverse pipeline schedule; grads keep the stacked layout, so
    an optimizer update stays stage-sharded.
    """
    mb = _splitMicro(x, microbatches)
    return _jittedFor("grad", blockFn, lossFn, mesh, stageAxis)(stackedParams, mb, target)
