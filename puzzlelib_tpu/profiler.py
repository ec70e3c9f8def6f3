"""Profiling / tracing integration (reference: timeKernel + TraceMalloc tiers,
/root/reference/Cuda/GPUBackend.py:332-368, /root/reference/Cuda/Source/TraceMalloc/).

On TPU the device-side story is jax.profiler: ``trace(logdir)`` captures an
XLA trace viewable in TensorBoard/XProf; ``annotate`` labels host regions.
``timeKernel`` re-exports the wall-clock kernel timer.
"""

import contextlib

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
