"""Data-parallel grid, API-compatible with /root/reference/Grid.py.

The reference forks one process per GPU and all-reduces gradients through
CUDA-IPC handles in a star topology (/root/reference/Grid.py:66-157).  JAX is
single-controller: here ``runGrid`` spawns one *thread* per device, pins each
node's computations to its device via ``jax.default_device``, and implements
``sumTensor``/``broadcastBuffer`` as real device-side collectives: the
per-node tensors are assembled into one array sharded over a grid Mesh and a
jitted mean/select with replicated output sharding makes GSPMD emit the
all-reduce/broadcast (ICI on real TPU meshes) — no host staging.  Semantics
(grad mean-allreduce before the update, scalar means, param broadcast at
setup) match the reference exactly.

**This is a compatibility shim, not the fast path.**  Each node dispatches
eagerly per-op from its own Python thread, so the GIL serializes host-side
dispatch across nodes; collectives are real, compute overlap is not.  For
production training use ``FusedStep(mesh=...)`` — one jitted step over a
device mesh with XLA-inserted collectives — which this repo measures at
>100x this path's throughput (docs/benchmarks.md).  ``runGrid`` exists so
reference ``TestLib/MultiGPU*.py`` scripts run unmodified.
"""

import threading

import numpy as np


class GridError(Exception):
    pass


class _Rendezvous:
    def __init__(self, size):
        self.size = size
        self.barrier = threading.Barrier(size)
        self.slots = [None] * size
        self.result = None
        self.errors = []


def runGrid(target, size, *args, devices=None, **kwargs):
    import jax

    available = jax.devices()

    if devices is None:
        devices = list(range(size))

    if size > len(available):
        raise GridError(
            "Grid size %d exceeds device count %d (hint: on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N)" % (size, len(available))
        )

    rendezvous = _Rendezvous(size)
    gridinfo = [NodeInfo(i, size, devices[i], rendezvous) for i in range(size)]

    threads = [
        threading.Thread(target=nodeRunner, args=(target, nodeinfo) + args, kwargs=kwargs)
        for nodeinfo in gridinfo
    ]

    for thread in threads:
        thread.start()

    for thread in threads:
        thread.join()

    if rendezvous.errors:
        raise rendezvous.errors[0]


def nodeRunner(target, nodeinfo, *args, **kwargs):
    import jax

    try:
        with jax.default_device(jax.devices()[nodeinfo.device]):
            target(nodeinfo, *args, **kwargs)

    except Exception as e:  # surface the first failure to the caller
        nodeinfo.rendezvous.errors.append(e)
        # release peers stuck on the barrier
        nodeinfo.rendezvous.barrier.abort()

    finally:
        nodeinfo.close()


class NodeInfo:
    def __init__(self, index, gridsize, device, rendezvous):
        self.index = index
        self.gridsize = gridsize
        self.device = device
        self.rendezvous = rendezvous

    def close(self):
        pass

    def _exchange(self, value, reducer):
        """All nodes deposit a value; node 0 reduces; everyone reads the result."""
        rv = self.rendezvous

        rv.slots[self.index] = value
        rv.barrier.wait()

        if self.index == 0:
            rv.result = reducer(rv.slots)

        rv.barrier.wait()
        result = rv.result
        rv.barrier.wait()

        return result

    def meanValue(self, value):
        return self._exchange(float(value), lambda vals: sum(vals) / self.gridsize)

    def _collective(self, tensor, kind):
        """Assemble every node's tensor into one mesh-sharded array, run a
        jitted reducer with replicated output (GSPMD inserts the
        collective), and hand each node its device-local replica."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        def runCollective(slots):
            allDevices = jax.devices()
            devices = [allDevices[devIdx] for _, devIdx in slots]
            mesh = Mesh(np.array(devices), ("grid", ))

            pieces = [
                jax.device_put(slot.jax.reshape((1, ) + slot.shape), dev)
                for (slot, _), dev in zip(slots, devices)
            ]
            stacked = jax.make_array_from_single_device_arrays(
                (len(devices), ) + slots[0][0].shape, NamedSharding(mesh, P("grid")), pieces,
            )

            # cache the jitted reducer per (kind, grid) so every training
            # step's allreduce hits the jit cache instead of retracing
            return _jittedReducer(kind, self.gridsize, tuple(d.id for d in devices), mesh)(stacked)

        replicated = self._exchange((tensor, self.device), runCollective)

        import jax as _jax
        mine = _jax.devices()[self.device]
        for shard in replicated.addressable_shards:
            if shard.device == mine:
                tensor._write(shard.data)
                return

        tensor._write(_jax.device_put(np.asarray(replicated), mine))

    def broadcastBuffer(self, name, buffer):
        """Device-side broadcast: node 0's buffer replaces every node's."""
        self._collective(buffer, "broadcast")

    def sumTensor(self, name, tensor):
        """Device-side mean-allreduce: every node's tensor is replaced by the
        grid mean."""
        self._collective(tensor, "mean")


import functools


@functools.lru_cache(maxsize=None)
def _jittedReducer(kind, gridsize, deviceIds, mesh):
    """One jitted reducer per (kind, grid) - fresh lambdas per call would
    defeat the jit cache and recompile on every allreduce."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if kind == "broadcast":
        def reducer(x):
            return x[0]
    else:
        scale = 1.0 / gridsize

        def reducer(x):
            return (jnp.sum(x.astype(jnp.float32), axis=0) * scale).astype(x.dtype)

    return jax.jit(reducer, out_shardings=NamedSharding(mesh, P()))
