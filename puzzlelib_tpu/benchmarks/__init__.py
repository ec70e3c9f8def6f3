"""Benchmark harnesses (reference: Cuda/Benchmarks + kernel __main__ timers)."""

import os


def enableCompileCache():
    """Persistent XLA executable cache shared by all harnesses — remote TPU
    compiles can take minutes cold, so harness re-runs hit a local cache."""
    # env check BEFORE touching jax backends: the axon plugin's backend hook
    # initialises its remote client even under JAX_PLATFORMS=cpu, and a
    # wedged relay turns that into an indefinite hang for CPU-only runs
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
        return          # CPU AOT entries are machine-feature-pinned; cache TPU only

    import jax

    if jax.default_backend() == "cpu":
        return

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cachedir = os.path.join(root, ".jax_cache")
    os.makedirs(cachedir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cachedir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
