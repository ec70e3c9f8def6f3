"""Hand-written Pallas TPU kernels for hot ops.

XLA already lowers GEMM/conv onto the MXU near roofline; these kernels exist
for (a) the fusions XLA cannot express across op boundaries, (b) explicit
control of tiling for the ``optimizeForShape`` autotune hook, and (c) CPU
interpret-mode parity testing.  The dispatch layer keeps XLA as the default
algo and switches per-shape when the autotuner measures a Pallas win.
"""


def available():
    """Pallas-TPU kernels need a real TPU (or interpret mode)."""
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon") or True  # interpret fallback
    except Exception:
        return False


def onTpu():
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
