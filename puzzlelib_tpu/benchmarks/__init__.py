"""Benchmark harnesses (reference: Cuda/Benchmarks + kernel __main__ timers)."""

import os


def enableCompileCache():
    """Persistent XLA executable cache shared by all harnesses — remote TPU
    compiles can take minutes cold, so harness re-runs hit a local cache."""
    import jax

    if jax.default_backend() == "cpu":
        return          # CPU AOT entries are machine-feature-pinned; cache TPU only

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cachedir = os.path.join(root, ".jax_cache")
    os.makedirs(cachedir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cachedir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
