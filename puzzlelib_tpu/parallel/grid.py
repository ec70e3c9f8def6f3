"""Data-parallel grid, API-compatible with /root/reference/Grid.py.

The reference forks one process per GPU and all-reduces gradients through
CUDA-IPC handles in a star topology (/root/reference/Grid.py:66-157).  JAX is
single-controller: here ``runGrid`` spawns one *thread* per device, pins each
node's computations to its device via ``jax.default_device``, and implements
``sumTensor``/``meanValue``/``broadcastBuffer`` with a barrier rendezvous +
cross-device mean.  Semantics (grad mean-allreduce before the update, scalar
means, param broadcast at setup) match the reference exactly.

For production throughput use ``FusedStep(mesh=...)`` instead - one jitted
step over a device mesh with XLA-inserted collectives.
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

    def broadcastBuffer(self, name, buffer):
        """Copy node 0's buffer contents into every node's buffer."""
        import jax

        source = self._exchange(buffer, lambda bufs: np.asarray(bufs[0].jax))

        if self.index != 0:
            buffer._write(jax.device_put(source, jax.devices()[self.device]))

    def sumTensor(self, name, tensor):
        """Mean-allreduce: every node's tensor is replaced by the grid mean."""
        import jax

        def reduceMean(tensors):
            acc = np.asarray(tensors[0].jax, dtype=np.float32)
            for t in tensors[1:]:
                acc = acc + np.asarray(t.jax, dtype=np.float32)

            return (acc / self.gridsize).astype(tensor.dtype)

        mean = self._exchange(tensor, reduceMean)
        tensor._write(jax.device_put(mean, jax.devices()[self.device]))
