"""Profiling / tracing integration (reference: timeKernel + TraceMalloc tiers,
/root/reference/Cuda/GPUBackend.py:332-368, /root/reference/Cuda/Source/TraceMalloc/).

On TPU the device-side story is jax.profiler: ``trace(logdir)`` captures an
XLA trace viewable in TensorBoard/XProf; ``annotate`` labels host regions.
``timeKernel`` re-exports the wall-clock kernel timer.
"""

import contextlib

import numpy as np

from puzzlelib_tpu.backend.device import timeKernel  # noqa: F401  (public re-export)


@contextlib.contextmanager
def trace(logdir, createPerfettoLink=False):
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=createPerfettoLink)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Label a host-side region in the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


# -- alloc-trace tier (TraceMalloc equivalent) ----------------------------------
#
# The reference compiles a malloc tracker into the native core
# (Compiler/Codegen/Malloc/TMalloc.c: ptr -> (size, file, line) tree,
# traceLeaks() = live count).  Here the tracked object is the GPUArray
# wrapper: while tracing is on, every allocator call records
# (nbytes, shape, dtype, callsite) and a weakref finalizer retires the entry,
# so liveAllocations() is the leak report.

_traceAllocs = {}
_traceSeq = 0
tracingAllocs = False


def _callsite():
    import traceback

    for frame in reversed(traceback.extract_stack()):
        if "puzzlelib_tpu" not in (frame.filename or ""):
            return "%s:%d" % (frame.filename, frame.lineno)

    return "<internal>"


def recordAlloc(ary):
    """Register one live GPUArray; called by the tensor allocators while
    ``startTraceMalloc`` is active."""
    import weakref

    global _traceSeq

    if not tracingAllocs:
        return

    _traceSeq += 1
    slot = _traceSeq

    nbytes = int(np.prod(ary.shape, dtype=np.int64)) * np.dtype(ary.dtype).itemsize
    _traceAllocs[slot] = (nbytes, tuple(ary.shape), str(ary.dtype), _callsite())

    weakref.finalize(ary, _traceAllocs.pop, slot, None)


def startTraceMalloc():
    """Begin tracking allocator calls (clears any previous trace)."""
    global tracingAllocs

    _traceAllocs.clear()
    tracingAllocs = True


def stopTraceMalloc():
    """Stop tracking; returns the live-allocation report."""
    global tracingAllocs

    tracingAllocs = False
    return liveAllocations()


def liveAllocations():
    """List of live traced allocations: (nbytes, shape, dtype, callsite),
    largest first."""
    return sorted(_traceAllocs.values(), reverse=True)


def traceLeaks():
    """Number of traced allocations still alive (reference: ${NAME}_traceLeaks)."""
    return len(_traceAllocs)


def formatAllocReport(top=20):
    lines = ["%10d B  %-18s %-10s %s" % (nbytes, shape, dtype, site)
             for nbytes, shape, dtype, site in liveAllocations()[:top]]
    total = sum(entry[0] for entry in _traceAllocs.values())

    return "\n".join(lines + ["%10d B live in %d allocations" % (total, len(_traceAllocs))])


def deviceMemoryStats():
    """Per-device memory statistics (allocated/peak bytes) when the backend
    exposes them; the TraceMalloc-equivalent observability hook."""
    import jax

    stats = {}
    for device in jax.devices():
        try:
            stats[str(device)] = device.memory_stats()
        except Exception:
            stats[str(device)] = None

    return stats
