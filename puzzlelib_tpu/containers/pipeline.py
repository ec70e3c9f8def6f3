"""Pipeline container: a Sequential of structurally identical stages that can
also run GPipe-distributed over a mesh "stage" axis.

The reference builds nets solely from Modules/Containers
(/root/reference/Containers/Sequential.py discipline); this container keeps
that contract for pipeline parallelism. On one device it IS a Sequential —
eager forward/backward, blueprint capture, HDF5 round-trip all inherited. On
a mesh, ``distributedGrad`` lifts the stage Modules through ``functionalize``
into the pure GPipe schedule (``parallel.pipeline``): stage weights stack
along a leading axis, ``shard_map`` pins one stage per device, activations
ride ``lax.ppermute`` over ICI, and the whole schedule (fwd + bwd) is one
compiled XLA program.
"""

import numpy as np

from puzzlelib_tpu.containers.container import ContainerError
from puzzlelib_tpu.containers.sequential import Sequential


class Pipeline(Sequential):
    def checkStageStructure(self):
        """All stages must share parameter structure (shapes and order) —
        the stacked-weights regime GPipe requires."""
        from puzzlelib_tpu.fused import collectParamBuffers

        shapes = None
        for index, stage in enumerate(self.graph):
            cur = [(buf.shape, str(buf.dtype)) for buf in collectParamBuffers(stage)]

            if shapes is None:
                shapes = cur
            elif cur != shapes:
                raise ContainerError(
                    "%s: stage %d parameter structure %s differs from stage 0 %s" %
                    (self, index, cur, shapes))

    def stackedStageParams(self):
        """Per-stage weight lists stacked along a new leading stage axis."""
        from puzzlelib_tpu.fused import collectParamBuffers
        from puzzlelib_tpu.parallel.pipeline import stackStageParams

        self.checkStageStructure()
        return stackStageParams(
            [[buf.jax for buf in collectParamBuffers(stage)] for stage in self.graph])

    def _stageApply(self):
        # cached: the jitted schedule (parallel.pipeline._jitCache) keys on
        # the apply callable's identity, so a fresh closure per call would
        # force a retrace+recompile every training step
        apply = getattr(self, "_applyCache", None)

        if apply is None or self._applyCacheLen != len(self.graph):
            from puzzlelib_tpu.fused import functionalize

            apply, _ = functionalize(self.graph[0])
            self._applyCache, self._applyCacheLen = apply, len(self.graph)

        return apply

    def distributedForward(self, x, mesh, stageAxis="stage", microbatches=None):
        """One GPipe forward over the mesh: x (batch, ...) -> output.

        ``microbatches`` defaults to the stage count. The batch must divide
        evenly into microbatches."""
        from puzzlelib_tpu.parallel.pipeline import pipelineForward
        from puzzlelib_tpu.tensor import GPUArray

        arr = x.jax if hasattr(x, "jax") else x
        out = pipelineForward(self._stageApply(), self.stackedStageParams(), arr,
                              mesh, stageAxis, microbatches or len(self.graph))
        return GPUArray(out)

    def distributedGrad(self, lossFn, x, target, mesh, stageAxis="stage", microbatches=None):
        """One fused train step over the mesh: returns (loss, stacked grads).

        ``lossFn(out, target) -> scalar``; gradients come back stacked along
        the stage axis, aligned with ``stackedStageParams()`` order."""
        from puzzlelib_tpu.parallel.pipeline import pipelineGrad

        xArr = x.jax if hasattr(x, "jax") else x
        tArr = target.jax if hasattr(target, "jax") else target

        return pipelineGrad(self._stageApply(), lossFn, self.stackedStageParams(),
                            xArr, tArr, mesh, stageAxis, microbatches or len(self.graph))

    @staticmethod
    def _stageVars(stage):
        """Variables of one stage in ``collectParamBuffers`` order (the
        module-tree walk both share)."""
        from puzzlelib_tpu.containers.container import Container
        from puzzlelib_tpu.fused import _rootBuffer

        seen, out = set(), []

        def walk(mod):
            for var in mod.vars.values():
                root = _rootBuffer(var.data)
                if id(root) not in seen:
                    seen.add(id(root))
                    out.append(var)

            if isinstance(mod, Container):
                for child in mod.modules.values():
                    walk(child)

        walk(stage)
        return out

    def foldStageGrads(self, stackedGrads, scale=1.0, momentum=0.0):
        """Scatter stacked stage gradients back into each stage Module's vars
        (the bridge from the functional schedule to the optimizer protocol).

        ``stackedGrads`` are jax loss-gradients (``value_and_grad`` output,
        the ASCENT direction); the Module protocol stores descent-aligned
        gradients that optimizers ADD (the reference's cost kernels emit the
        negated loss gradient, e.g. /root/reference/Cost/MSE.py's
        ``(target-pred)/N``), so the fold negates."""
        for index, stage in enumerate(self.graph):
            for var, g in zip(self._stageVars(stage),
                              [jaxG[index] for jaxG in stackedGrads]):
                if var.grad is not None:
                    var.grad._write(-scale * g.reshape(var.grad.shape)
                                    + momentum * var.grad.jax)
