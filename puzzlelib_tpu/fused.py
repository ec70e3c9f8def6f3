"""Fused training: trace the whole eager train step into one XLA executable.

The eager object layer (Modules -> backend -> ops) dispatches one XLA op per
kernel - cheap on CUDA, expensive as separate executables on TPU.  Because
every op is functionally pure over rebindable GPUArray buffers, the *entire*
reference train step

    grad = cost(module(data), target); zeroGrad; module.backward(grad);
    optimizer.update()

can be traced once with tracer-substituted buffers and compiled by XLA into a
single fused program (forward + backward + fused optimizer update + loss
accumulation), with input buffers donated so parameters update in place in
HBM.  No per-module changes are needed; the module tree *is* the program.

This is the TPU answer to the reference's eager hot loop
(/root/reference/Handlers/Trainer.py:28 + hand-fused CUDA kernels): instead of
per-layer kernel launches, one compiled step per (shape, dtype) signature.

Python-side counters (cost.numOfSamples, optimizer.t, BN.numOfProps) advance
in the eager wrapper; traced equivalents flow through ``fusedctx``.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from puzzlelib_tpu import fusedctx
from puzzlelib_tpu.tensor import GPUArray, _View
from puzzlelib_tpu.containers.container import Container


def _rootBuffer(ary):
    while isinstance(ary, _View):
        ary = ary._base

    return ary


def collectStateBuffers(module, cost=None, optimizer=None, withMeta=False):
    """Unique root GPUArray buffers whose contents the train step mutates.

    With ``withMeta`` also returns per-buffer provenance
    (owner module, var/attr name) for sharding rules."""
    seen, roots, meta = set(), [], []

    def add(ary, owner=None, name=None):
        if not isinstance(ary, GPUArray):
            return

        root = _rootBuffer(ary)
        if id(root) not in seen:
            seen.add(id(root))
            roots.append(root)
            meta.append((owner, name))

    def walkModule(mod):
        for varname, var in mod.vars.items():
            add(var.data, mod, varname)
            if var.grad is not None:
                add(var.grad, mod, varname)

        for attrname, attr in mod.attrs.items():
            add(attr, mod, attrname)

        if isinstance(mod, Container):
            for child in mod.modules.values():
                walkModule(child)

    walkModule(module)

    if optimizer is not None:
        for varname, state in optimizer.states.items():
            for entity in state.values():
                owner = None
                try:
                    var = optimizer.module.getVar(varname) if optimizer.module is not None else None
                    owner = var
                except Exception:
                    pass

                add(entity, owner, varname)

        for globalVar in optimizer.globalVar.values():
            add(globalVar.data)
            add(globalVar.grad)

    if cost is not None:
        add(cost.devErr)
        add(cost.accumErr)

    if withMeta:
        return roots, meta

    return roots


def collectParamBuffers(module):
    """Unique root weight buffers (var data only - no grads, no attrs)."""
    seen, roots = set(), []

    def walk(mod):
        for var in mod.vars.values():
            root = _rootBuffer(var.data)
            if id(root) not in seen:
                seen.add(id(root))
                roots.append(root)

        if isinstance(mod, Container):
            for child in mod.modules.values():
                walk(child)

    walk(module)
    return roots


def functionalize(module):
    """Pure-apply view of a Module-layer net: returns ``(apply, params)``.

    ``apply(params, x)`` substitutes the weight pytree into the live module's
    buffers, runs the eager forward under the caller's trace, and returns the
    jax output; ``params`` is the current weight list.  This is what lets
    Module-built nets ride the functional parallel schedules - GPipe stages
    (``parallel.pipeline``) and MoE experts (``parallel.moe``) - without
    rewriting them as raw jax functions.

    Sibling modules that share the template's structure can supply their own
    weights via ``collectParamBuffers(sibling)`` (buffer order follows the
    module tree, so identical structure means identical order).
    """
    buffers = collectParamBuffers(module)
    originals = [buf.jax for buf in buffers]

    def apply(params, x):
        # snapshot at CALL time, not closure creation: a jit retrace after
        # the live module has trained would otherwise restore stale
        # creation-time weights and silently undo every update so far
        saved = [buf.jax for buf in buffers]

        for buf, arr in zip(buffers, params):
            buf._write(arr)

        try:
            out = module(GPUArray(x))
            return out.jax
        finally:
            # restore the concrete pre-trace weights: without this a
            # jit-traced apply leaves tracers in the live module's buffers
            # and any later eager use of the net dereferences a dead trace
            for buf, arr in zip(buffers, saved):
                buf._write(arr)
            module.reset()

    return apply, originals


def tensorParallelSpecs(module, cost, optimizer, mesh, modelAxis="model"):
    """Per-buffer PartitionSpecs for simple Megatron-style tensor parallelism:
    Linear weights shard on the output-feature dim, Conv weights on outmaps.
    Optimizer state for a sharded var shards the same way (shape-matched);
    everything else is replicated.  GSPMD inserts the activation collectives.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from puzzlelib_tpu.modules.linear import Linear
    from puzzlelib_tpu.modules.convnd import ConvND

    buffers, meta = collectStateBuffers(module, cost, optimizer, withMeta=True)

    # var-shape -> spec map for matching optimizer state entities
    shapeSpecs = {}

    def specFor(owner, name, buf):
        if isinstance(owner, Linear) and name == "W":
            spec = P(None, modelAxis) if not owner.transpose else P(modelAxis, None)
        elif isinstance(owner, Linear) and name == "b":
            spec = P(modelAxis)
        elif isinstance(owner, ConvND) and name == "W":
            spec = P(modelAxis)
        elif isinstance(owner, ConvND) and name == "b":
            spec = P(None, modelAxis)
        else:
            return P()

        # only shard when the dim divides evenly over the axis
        axisSize = mesh.shape[modelAxis]
        dims = [d for d, s in zip(buf.shape, spec) if s is not None]

        if any(d % axisSize != 0 for d in dims):
            return P()

        shapeSpecs[buf.shape] = spec
        return spec

    specs = []
    for buf, (owner, name) in zip(buffers, meta):
        if owner is not None and not isinstance(owner, str):
            from puzzlelib_tpu.variable import Variable

            if isinstance(owner, Variable):
                # optimizer state entity: shard like the variable it tracks
                specs.append(shapeSpecs.get(buf.shape, P()))
                continue

            specs.append(specFor(owner, name, buf))
        else:
            specs.append(shapeSpecs.get(buf.shape, P()))

    return [NamedSharding(mesh, spec) for spec in specs]


def zeroOptimizerSpecs(module, cost, optimizer, mesh, dataAxis="data"):
    """ZeRO-1-style sharding: optimizer state buffers shard over the DATA
    axis (first evenly-divisible dim), params/grads stay replicated.

    The reference's grid DP (/root/reference/Grid.py) replicates optimizer
    state on every GPU; with GSPMD the state shards instead — each device
    holds 1/N of every momentum/variance slot and XLA inserts the gather when
    the weight update needs it.  Requires ``setupOn(useGlobalState=False)``
    (per-var state entities, same as tensorParallelSpecs).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from puzzlelib_tpu.variable import Variable

    buffers, meta = collectStateBuffers(module, cost, optimizer, withMeta=True)
    axisSize = mesh.shape[dataAxis]

    specs = []
    for buf, (owner, name) in zip(buffers, meta):
        spec = P()

        if isinstance(owner, Variable):                # an optimizer state slot
            dims = [None] * buf.ndim
            for d in range(buf.ndim):
                if buf.shape[d] % axisSize == 0 and buf.shape[d] >= axisSize:
                    dims[d] = dataAxis
                    break

            spec = P(*dims)

        specs.append(NamedSharding(mesh, spec))

    return specs


class FusedStep:
    """Compile (module, cost, optimizer) into a single jitted train step.

    Call with host or device arrays; parameters/optimizer state update in
    place (donated buffers).  Retraces only when input shapes change.
    """

    def __init__(self, module, cost, optimizer, donate=True, mesh=None, dataAxis="data",
                 stateShardings=None):
        self.module = module
        self.cost = cost
        self.optimizer = optimizer

        if getattr(optimizer, "globalState", False):
            # the SharedArray flat buffer (reference parity for the CUDA
            # world's single-kernel update + IPC allreduce) is hostile to XLA
            # layout assignment: every step each weight is sliced from the
            # flat {canonical} buffer, re-laid-out for its conv ({0,1,3,2}
            # vs {3,2,1,0} + tiling mismatch), and packed back - profiled at
            # ~37 ms/step on VGG-16 bf16 b32 (68.4 -> 31.5 ms with per-var
            # state, 2026-08-19 trace). Per-var state fuses the update into
            # each param's own layout for free.
            import logging
            logging.getLogger("puzzlelib_tpu").warning(
                "FusedStep: optimizer uses fused global state (SharedArray); "
                "on TPU this forces per-step weight relayouts (~2x VGG-16 "
                "step cost). Prefer setupOn(..., useGlobalState=False) with "
                "FusedStep.")

        self.buffers, bufferMeta = collectStateBuffers(module, cost, optimizer, withMeta=True)

        # conv weight slots (W, dW, optimizer state tracking W) ride the
        # step carry channels-last: bind/return permutes sit adjacent to the
        # conv ops' own layout transposes and cancel, so the weight update
        # fuses in the bwd-filter conv's natural CO-last layout instead of
        # pulling a {co,c,kh,kw}-tiled relayout into the momentum pass
        # (docs/kernels.md "Whole-net wall analysis": ~8 ms of the VGG-16
        # bf16 b32 step).  Pure permutation - boundary state, shardings and
        # user-visible buffers stay logical (co, c, *k).
        from puzzlelib_tpu import config as Config
        self._carry = self._carryPerms(bufferMeta) if Config.fusedConvLayout == "hwio" else {}

        jitKwargs = dict(donate_argnums=(0, ) if donate else ())

        if mesh is not None:
            # GSPMD parallelism: batch dim sharded over the data axis; state
            # replicated by default, or per-buffer sharded (tensor parallelism
            # via tensorParallelSpecs) - XLA inserts all collectives over ICI.
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            batchSharded = NamedSharding(mesh, P(dataAxis))

            stateSpec = stateShardings if stateShardings is not None else [repl] * len(self.buffers)

            jitKwargs["in_shardings"] = (stateSpec, None, repl, repl, batchSharded, batchSharded)
            jitKwargs["out_shardings"] = stateSpec

        self.mesh = mesh
        self._dpSize = mesh.shape[dataAxis] if mesh is not None else 1
        self._jitted = jax.jit(self._stepEntry, **jitKwargs)

        manyKwargs = dict(jitKwargs)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            stepSharded = NamedSharding(mesh, P(None, dataAxis))
            manyKwargs["in_shardings"] = (
                jitKwargs["in_shardings"][0], None, repl, repl, stepSharded, stepSharded
            )

            # ragged-batch fallback: a batch that does not divide over the data
            # axis runs with replicated inputs (identical numerics, no DP split)
            # - typically only the leftover batch of an epoch
            raggedIn = (jitKwargs["in_shardings"][0], None, repl, repl, repl, repl)
            self._jittedRagged = jax.jit(
                self._stepEntry, **{**jitKwargs, "in_shardings": raggedIn})
            self._jittedManyRagged = jax.jit(
                self._traceMany, **{**manyKwargs, "in_shardings": raggedIn})

        self._jittedMany = jax.jit(self._traceMany, **manyKwargs)
        self._seed = int(np.random.randint(1 << 31))
        self._calls = 0

    def _carryPerms(self, meta):
        """Slot -> (toCarry, fromCarry) permutations for conv weight state.

        Marks ConvND var buffers (W data and grad share owner/name) and any
        optimizer state entity whose tracked Variable's data root is a marked
        weight.  Numerically this is a no-op by construction: every marked
        array is permuted into the carry and permuted back at bind time."""
        from puzzlelib_tpu.modules.convnd import ConvND
        from puzzlelib_tpu.variable import Variable

        wRoots = {}                               # id(W root) -> W shape
        perms = {}

        def mark(i, ndim):
            toCarry = tuple(range(2, ndim)) + (1, 0)          # OI*sp -> *sp,I,O
            fromCarry = (ndim - 1, ndim - 2) + tuple(range(ndim - 2))
            perms[i] = (toCarry, fromCarry)

        for i, (buf, (owner, name)) in enumerate(zip(self.buffers, meta)):
            if isinstance(owner, ConvND) and name == "W" and buf.ndim >= 3:
                wRoots[id(buf)] = buf.shape       # data and grad both land here
                mark(i, buf.ndim)

        for i, (buf, (owner, name)) in enumerate(zip(self.buffers, meta)):
            if isinstance(owner, Variable):       # an optimizer state slot
                root = _rootBuffer(owner.data)
                if wRoots.get(id(root)) == buf.shape:
                    mark(i, buf.ndim)

        return perms

    def _toCarry(self, state):
        return [jnp.transpose(a, self._carry[i][0]) if i in self._carry else a
                for i, a in enumerate(state)]

    def _fromCarry(self, state):
        return [jnp.transpose(a, self._carry[i][1]) if i in self._carry else a
                for i, a in enumerate(state)]

    def _invoke(self, fn, *args):
        # mesh steps trace with Pallas dispatch disabled: the GSPMD
        # partitioner cannot shard an opaque pallas_call and would replicate
        # its operands across the mesh (tracing happens inside the first
        # call, so the gate wraps every invocation - cached executions are
        # unaffected)
        if self.mesh is not None:
            from puzzlelib_tpu.ops.conv import disablePallas

            with disablePallas():
                return fn(*args)

        return fn(*args)

    def _hyper(self):
        hyper = {}
        for name in self.optimizer.attrs:
            val = getattr(self.optimizer, name)
            if name != "t" and isinstance(val, (int, float)):
                hyper[name] = float(val)

        return hyper

    def _stepEntry(self, state, hyper, t, key, data, target):
        """Boundary single step: logical-layout state in and out; the carry
        conversion is inside the program so XLA folds it."""
        return self._fromCarry(self._traceStep(self._toCarry(state), hyper, t, key, data, target))

    def _traceStep(self, state, hyper, t, key, data, target):
        """One train step over CARRY-domain state (conv weight slots
        channels-last when ``Config.fusedConvLayout == "hwio"``)."""
        # substitute traced buffers into the live wrappers (logical layout)
        for buf, arr in zip(self.buffers, self._fromCarry(state)):
            buf._write(arr)

        # optimizer hyper-parameters become traced values for the duration
        snapshot = {name: getattr(self.optimizer, name) for name in hyper}
        for name, val in hyper.items():
            setattr(self.optimizer, name, val)

        costCounters = (self.cost.batchsize, self.cost.numOfSamples)
        optT = self.optimizer.t

        try:
            with fusedctx.activate(hyper, t, key):
                grad = self.cost(self.module(GPUArray(data)), GPUArray(target), queryError=False)

                self.optimizer.zeroGradParams()
                self.module.backward(grad, updGrad=False)
                self.optimizer.update()

        finally:
            for name, val in snapshot.items():
                setattr(self.optimizer, name, val)

            self.cost.batchsize, self.cost.numOfSamples = costCounters
            self.optimizer.t = optT

        return self._toCarry([buf.jax for buf in self.buffers])

    def _traceMany(self, state, hyper, t0, key, dataK, targetK):
        """K train steps inside ONE program: lax.scan over the leading step
        dim of (dataK, targetK) carrying the state buffers — one dispatch for
        K steps, amortizing per-execute host/relay latency.

        devErr is summed across the K steps (each step overwrites it), so
        ``cost.getError()`` after a grouped dispatch = mean over all K*b
        samples, consistent with the single-step semantics."""
        devErrSlot = next((i for i, buf in enumerate(self.buffers) if buf is self.cost.devErr), None)

        def body(carry, xs):
            st, errSum = carry
            d, tgt, i = xs

            stepKey = jax.random.fold_in(key, i)
            st = self._traceStep(st, hyper, t0 + i.astype(jnp.float32), stepKey, d, tgt)

            if devErrSlot is not None:
                errSum = errSum + st[devErrSlot].astype(jnp.float32)

            return (st, errSum), None

        carry0 = (self._toCarry(list(state)), jnp.zeros((), jnp.float32))
        (state, errSum), _ = jax.lax.scan(body, carry0, (dataK, targetK, jnp.arange(dataK.shape[0])))

        state = self._fromCarry(state)
        if devErrSlot is not None:
            state[devErrSlot] = errSum.astype(state[devErrSlot].dtype)

        return state

    def many(self, data, target, steps):
        """Run ``steps`` consecutive train steps in one XLA dispatch.

        ``data``/``target`` hold ``steps`` minibatches stacked on the leading
        dim: (steps * b, ...) split evenly, or already (steps, b, ...).
        """
        data = data.jax if isinstance(data, GPUArray) else jnp.asarray(data)
        target = target.jax if isinstance(target, GPUArray) else jnp.asarray(target)

        if data.shape[0] != steps:                    # (steps*b, ...) layout
            if data.shape[0] % steps != 0:
                raise ValueError("Leading dim %d not divisible into %d steps" %
                                 (data.shape[0], steps))
            b = data.shape[0] // steps
            data = data.reshape((steps, b) + data.shape[1:])
            target = target.reshape((steps, b) + target.shape[1:])

        self._calls += 1
        t0 = float(self.optimizer.t + 1)

        self.optimizer.t += steps
        self.cost.reset()
        self.cost.dirty = True
        self.cost.updateState(int(data.shape[0] * data.shape[1]))

        state = [buf.jax for buf in self.buffers]
        key = jax.random.fold_in(jax.random.key(self._seed), self._calls)

        fn = self._jittedManyRagged if self._dpSize > 1 and data.shape[1] % self._dpSize \
            else self._jittedMany
        out = self._invoke(fn, state, self._hyper(), jnp.asarray(t0, jnp.float32),
                           key, data, target)

        for buf, arr in zip(self.buffers, out):
            buf._write(arr)

        self.module.reset()
        return self.cost

    def __call__(self, data, target):
        data = data.jax if isinstance(data, GPUArray) else jnp.asarray(data)
        target = target.jax if isinstance(target, GPUArray) else jnp.asarray(target)

        self._calls += 1

        # python-side counters advance exactly as in the eager path
        self.optimizer.t += 1
        self.cost.reset()
        self.cost.dirty = True
        self.cost.updateState(int(data.shape[0]))

        state = [buf.jax for buf in self.buffers]
        hyper = self._hyper()

        key = jax.random.fold_in(jax.random.key(self._seed), self._calls)

        fn = self._jittedRagged if self._dpSize > 1 and data.shape[0] % self._dpSize \
            else self._jitted
        out = self._invoke(fn, state, hyper, jnp.asarray(self.optimizer.t, jnp.float32),
                           key, data, target)

        for buf, arr in zip(self.buffers, out):
            buf._write(arr)

        self.module.reset()
        return self.cost


def collectEvalBuffers(module):
    """Root param + attr buffers an eval-mode forward reads (no grads)."""
    seen, roots = set(), []

    def add(ary):
        if not isinstance(ary, GPUArray):
            return

        root = _rootBuffer(ary)
        if id(root) not in seen:
            seen.add(id(root))
            roots.append(root)

    def walk(mod):
        for var in mod.vars.values():
            add(var.data)

        for attr in mod.attrs.values():
            add(attr)

        if isinstance(mod, Container):
            for child in mod.modules.values():
                walk(child)

    walk(module)
    return roots


def _treeUnwrap(x):
    if isinstance(x, list):
        return [_treeUnwrap(item) for item in x]

    return x.jax if isinstance(x, GPUArray) else jnp.asarray(x)


def _treeWrap(x):
    if isinstance(x, list):
        return [_treeWrap(item) for item in x]

    return GPUArray(x)


class _FusedEvalProgram:
    """One eval-mode pass of the module (+ optional cost validation) compiled
    into a single jitted program.

    The eager object layer is traced exactly like ``FusedStep._traceStep``:
    parameter/attr root buffers ride as traced operands (no donation — eval
    mutates nothing), and tracer writes into the live wrappers are undone
    after every call by rebinding the concrete state.  One executable per
    input-shape signature (a ragged last batch retraces once)."""

    def __init__(self, module, cost=None):
        self.module = module
        self.cost = cost
        self.buffers = collectEvalBuffers(module)
        self._jitted = jax.jit(self._run)

    def _bind(self, state):
        for buf, arr in zip(self.buffers, state):
            buf._write(arr)

    def _run(self, state, data, target=None):
        self._bind(state)
        out = self.module(_treeWrap(data))

        if self.cost is not None:
            return self.cost.calcValDev(out, _treeWrap(target))

        return _treeUnwrap(out)

    def __call__(self, data, target=None):
        state = [buf.jax for buf in self.buffers]
        args = (state, _treeUnwrap(data))
        if self.cost is not None:
            args += (_treeUnwrap(target), )

        try:
            return self._jitted(*args)
        finally:
            # rebind the concrete buffers: the first call's trace wrote
            # tracers through the live module (and cost.mostProb); any later
            # eager use would otherwise dereference a dead trace
            self._bind(state)
            self.module.reset()
            if self.cost is not None:
                self.cost.reset()


from puzzlelib_tpu.handlers.trainer import Trainer


class FusedTrainer(Trainer):
    """Drop-in Trainer running the single-executable fused step.

    ``stepsPerDispatch > 1`` groups that many consecutive minibatches into one
    ``FusedStep.many`` dispatch (lax.scan inside the program) — per-dispatch
    host latency amortizes across K steps.  Grouping only engages when no
    per-batch callback is set; leftover/partial batches use the single step.
    """

    def __init__(self, mod, cost, optimizer, onBatchFinish=None, batchsize=128, stepsPerDispatch=1):
        super().__init__(mod, cost, optimizer, onBatchFinish, batchsize)
        self.step = None
        self.stepsPerDispatch = stepsPerDispatch

    def _ensureStep(self):
        if self.step is None:
            self.step = FusedStep(self.module, self.cost, self.optimizer)

    def handle(self, data, state=None, random=True):
        K = self.stepsPerDispatch

        if K <= 1 or self.onBatchFinish is not None:
            super().handle(data, state, random=random)
            return

        self._ensureStep()

        dat, target = data
        datasize = dat.shape[0]

        nFull = datasize // self.batchsize
        self.totalBatches = (datasize + self.batchsize - 1) // self.batchsize

        order = np.random.permutation(nFull) if random else np.arange(nFull)

        done = 0
        for start in range(0, nFull - nFull % K, K):
            idx = np.concatenate([
                np.arange(n * self.batchsize, (n + 1) * self.batchsize)
                for n in order[start:start + K]
            ])

            chunkData = GPUArray(jnp.take(dat.jax, idx, axis=0))
            chunkTarget = GPUArray(jnp.take(target.jax, idx, axis=0))

            self.step.many(chunkData, chunkTarget, steps=K)
            done += K
            self.currBatch = done

        # leftover full batches + the final partial batch via single steps
        for n in list(order[nFull - nFull % K:nFull]) + ([nFull] if datasize % self.batchsize else []):
            batch = self.sliceData(data, n, self.batchsize, postSlice=lambda d: d)
            self.step(*batch)
            done += 1
            self.currBatch = done

        self.module.reset()

    def handleBatch(self, batch, idx, state):
        data, target = batch

        self._ensureStep()
        self.step(data, target)


from puzzlelib_tpu.handlers.validator import Validator
from puzzlelib_tpu.handlers.calculator import Calculator


class FusedValidator(Validator):
    """Validator running forward + validation as ONE compiled program per
    batch, with the error accumulated on device.

    The eager Validator dispatches one XLA executable per module op — through
    the TPU relay that costs ~ms per op, so validating between epochs can
    dominate a fused training run.  This compiles the eval-mode forward and
    the cost's traced validation (``Cost.calcValDev``) into a single program,
    keeps per-batch errors as lazy device scalars, and reads the total back
    once per ``validate``/``validateFromHost`` call.

    Costs without ``calcValDev`` (Multi's list-valued protocol, CTC's absent
    one) fall back to the eager per-batch path automatically."""

    def __init__(self, mod, cost, onBatchFinish=None, batchsize=128):
        super().__init__(mod, cost, onBatchFinish, batchsize)
        self._program = None
        self._fallback = False

    def handleBatch(self, batch, idx, state):
        if self._fallback:
            super().handleBatch(batch, idx, state)
            return

        data, target = batch

        if self._program is None:
            self._program = _FusedEvalProgram(self.module, self.cost)

        try:
            err = self._program(data, target)
        except NotImplementedError:
            self._fallback = True
            self._program = None
            super().handleBatch(batch, idx, state)
            return

        error = state["error"]
        # float + traced scalar stays a lazy device value: no host sync until
        # the final division in validate/validateFromHost forces it
        error[0] = error[0] + self.getDataSize(data) * err

    def _finalize(self, err):
        err = [float(e) for e in err] if isinstance(err, list) else float(err)
        self.error = err
        return err

    def validateFromHost(self, data, target, macroBatchSize=10000, onMacroBatchFinish=None):
        return self._finalize(
            super().validateFromHost(data, target, macroBatchSize, onMacroBatchFinish))

    def validate(self, data, target):
        return self._finalize(super().validate(data, target))


class FusedCalculator(Calculator):
    """Calculator whose batched inference forward is one compiled program per
    batch instead of one dispatch per module op (same host/device assembly
    as the eager Calculator)."""

    def __init__(self, mod, onBatchFinish=None, batchsize=128):
        super().__init__(mod, onBatchFinish, batchsize)
        self._program = None

    def handleBatch(self, batch, idx, state):
        if self._program is None:
            self._program = _FusedEvalProgram(self.module)

        self._storeBatch(_treeWrap(self._program(batch)), idx, state)
