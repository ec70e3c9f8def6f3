"""Switch-style top-1 mixture-of-experts as a first-class Container.

The reference builds nets solely from Modules/Containers; this brings the
expert-parallel layer (``parallel.moe``) up to that contract: experts are
ordinary Modules appended like Sequential children (blueprint capture and
HDF5 round-trip come from the Container protocol), the gate is a Variable,
and both directions run as fused XLA programs.

Eager semantics match the distributed path exactly: the same top-1
capacity-limited dispatch/combine tensors (``parallel.moe._dispatch``), with
every expert applied to its gathered token buffer. On a mesh,
``distributedForward`` shards the expert axis via ``shard_map``
(``parallel.moe.moeForward``) so each device runs only its local experts.

Backward rides one cached VJP over (x, gate, expert weights) — the pattern
MultiHeadAttention uses — so updateGrad and accGradParams share a single
backward computation.
"""

import numpy as np

from puzzlelib_tpu.backend import gpuarray
from puzzlelib_tpu.tensor import GPUArray
from puzzlelib_tpu.variable import Variable
from puzzlelib_tpu.modules.module import ModuleError, Module
from puzzlelib_tpu.containers.container import Container, ContainerError


class MoEGate(Module):
    """Router weight holder: a leaf child of SwitchMoE so the container
    protocol (persistence, var tables, calcMode) covers the gate for free.
    The gate is never called as a layer - SwitchMoE computes routing inside
    its own fused forward."""

    def __init__(self, insize, nExperts, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        rng = np.random.RandomState(nExperts)
        self.setVar("W", Variable(gpuarray.to_gpu(
            (rng.randn(insize, nExperts) * 0.02).astype(np.float32))))

    def updateData(self, data):
        raise ModuleError("MoEGate is routed inside SwitchMoE, not called directly")

    def updateGrad(self, grad):
        raise ModuleError("MoEGate is routed inside SwitchMoE, not called directly")

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape


class SwitchMoE(Container):
    def __init__(self, insize, capacityFactor=1.25, auxWeight=0.01, name=None):
        super().__init__(name)
        self.registerBlueprint(locals())

        self.insize = insize
        self.capacityFactor = capacityFactor
        self.auxWeight = auxWeight

        self.graph = []
        self._gateMod = None

        self.auxLoss = None
        self._vjpCache, self._vjpGradArr = None, None

    # -- expert registry ---------------------------------------------------------

    def append(self, mod, acquire=True):
        super().append(mod, acquire)
        self.graph.append(mod)

        # the gate grows one column per expert: re-key its child module
        # (reproducibly seeded by the expert count; load() overwrites it)
        self._gateMod = MoEGate(self.insize, len(self.graph), name="__gate__")
        self.modules["__gate__"] = self._gateMod

        return self

    @property
    def gateVar(self):
        return self._gateMod.vars["W"]

    def getBlueprint(self):
        blueprint = super().getBlueprint()
        blueprint["graph"] = [mod.name for mod in self.graph]
        return blueprint

    @property
    def nExperts(self):
        return len(self.graph)

    def _capacity(self, tokens):
        return max(1, int(np.ceil(tokens * self.capacityFactor / self.nExperts)))

    def _expertParams(self):
        from puzzlelib_tpu.fused import collectParamBuffers
        return [[buf.jax for buf in collectParamBuffers(e)] for e in self.graph]

    # -- eager path --------------------------------------------------------------

    def _pureForward(self, x, gateW, expertParams):
        """(tokens, d) -> ((tokens, d), auxLoss) with capacity-limited top-1
        routing; identical math to the mesh path."""
        import jax.numpy as jnp
        from puzzlelib_tpu.fused import functionalize
        from puzzlelib_tpu.parallel.moe import _dispatch

        capacity = self._capacity(x.shape[0])
        dispatch, combine, aux = _dispatch(gateW, x, self.nExperts, capacity)

        expertIn = jnp.einsum("bec,bd->ecd", dispatch, x)          # (E, C, d)

        apply, _ = functionalize(self.graph[0])
        outs = jnp.stack([apply(params, expertIn[e])
                          for e, params in enumerate(expertParams)])

        y = jnp.einsum("bec,ecd->bd", combine, outs.astype(x.dtype))
        return y.astype(x.dtype), aux

    def updateData(self, data):
        y, aux = self._pureForward(data.jax, self.gateVar.data.jax, self._expertParams())

        self.data = GPUArray(y)
        self.auxLoss = GPUArray(aux)
        self._vjpCache, self._vjpGradArr = None, None

    def _vjp(self, grad):
        if self._vjpCache is None or self._vjpGradArr is not grad.jax:
            import jax

            flat = [p for params in self._expertParams() for p in params]
            perExpert = len(flat) // self.nExperts if self.nExperts else 0

            def fwd(x, gateW, *flatParams):
                params = [list(flatParams[e * perExpert:(e + 1) * perExpert])
                          for e in range(self.nExperts)]
                y, aux = self._pureForward(x, gateW, params)
                return y, aux

            (y, aux), vjp = jax.vjp(fwd, self.inData.jax, self.gateVar.data.jax, *flat)

            # the router learns through the load-balancing loss: inject its
            # DESCENT gradient (optimizers add updates) alongside the data grad
            gAux = -jax.numpy.asarray(self.auxWeight, aux.dtype)
            self._vjpCache = vjp((grad.jax, gAux))
            self._vjpGradArr = grad.jax

        return self._vjpCache

    def updateGrad(self, grad):
        self.grad = GPUArray(self._vjp(grad)[0])

    def accGradParams(self, grad, scale=1.0, momentum=0.0):
        results = self._vjp(grad)
        gateGrad, flatGrads = results[1], results[2:]

        self._gateMod.foldParamGrad("W", gateGrad, scale, momentum)

        from puzzlelib_tpu.containers.pipeline import Pipeline
        perExpert = len(flatGrads) // self.nExperts

        for e, expert in enumerate(self.graph):
            for var, g in zip(Pipeline._stageVars(expert),
                              flatGrads[e * perExpert:(e + 1) * perExpert]):
                if var.grad is not None:
                    var.grad._write(scale * g.reshape(var.grad.shape)
                                    + momentum * var.grad.jax)

    # -- mesh path ---------------------------------------------------------------

    def distributedForward(self, x, mesh, expertAxis="expert"):
        """Expert-parallel forward over the mesh: each device runs its local
        experts; returns (output, auxLoss)."""
        from puzzlelib_tpu.fused import functionalize
        from puzzlelib_tpu.parallel.moe import stackExpertParams, moeForward

        arr = x.jax if hasattr(x, "jax") else x
        stacked = stackExpertParams(self._expertParams())
        apply, _ = functionalize(self.graph[0])

        out, aux = moeForward(apply, stacked, self.gateVar.data.jax, arr, mesh,
                              expertAxis, capacityFactor=self.capacityFactor)
        return GPUArray(out), GPUArray(aux)

    # -- protocol ----------------------------------------------------------------

    def reset(self):
        super().reset()
        self.auxLoss = None
        self._vjpCache, self._vjpGradArr = None, None

    def checkDataShape(self, shape):
        if len(shape) != 2:
            raise ModuleError("Data must be 2d (tokens, features)")

        if shape[1] != self.insize:
            raise ModuleError("Expected %d features, %d were given" % (self.insize, shape[1]))

        if not self.graph:
            raise ContainerError("%s has no experts" % self)

    def checkGradShape(self, shape):
        self.checkDataShape(shape)

    def dataShapeFrom(self, shape):
        return shape

    def gradShapeFrom(self, shape):
        return shape
