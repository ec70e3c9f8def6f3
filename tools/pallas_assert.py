"""On-chip Pallas path assertions: every claimed-Pallas configuration must
actually COMPILE AND RUN on the TPU, and agree numerically with the XLA
reference — a Mosaic regression between campaign windows fails this section
loudly instead of silently rerouting to the XLA fallback.

Covers:
  flash      flashAttention fwd + custom-VJP bwd at seq 2048 (the kernel that
             beats XLA 1.5-2.17x and ships as the "auto" long-seq default)
  winograd   fused F(2x2,3x3) forward at a body shape (forced dispatch; the
             dispatchStats tally proves the kernel path ran, not the fallback)
  winoFG     transform-domain bwd-filter kernel
  gemm       Pallas MXU matmul tiles

Run: python tools/pallas_assert.py            (raises / exits 1 on any failure)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def assertClose(a, b, tol, what):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = np.abs(a - b).max() / max(1.0, np.abs(b).max())
    if not np.isfinite(a).all():
        raise AssertionError("%s: non-finite output" % what)
    if err > tol:
        raise AssertionError("%s: rel err %.3g > %.3g" % (what, err, tol))
    print("  %-10s OK (rel err %.2e)" % (what, err), flush=True)


def main():
    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    if jax.devices()[0].platform == "cpu":
        print("# CPU platform: Pallas assertions need the TPU")
        return

    key = jax.random.key(0)

    # -- flash attention: fwd + bwd through the custom VJP ---------------------
    from puzzlelib_tpu.ops.pallas.flash import flashAttention
    from puzzlelib_tpu.ops.attention import attention

    b, h, s, d = 2, 4, 2048, 64
    ks = jax.random.split(key, 3)
    q, k, v = [(jax.random.normal(kk, (b, h, s, d), jnp.float32) * 0.5
                ).astype(jnp.bfloat16) for kk in ks]

    for causal in (False, True):
        out = flashAttention(q, k, v, causal)
        ref = attention(q, k, v, causal=causal)
        assertClose(out, ref, 2e-2, "flash%s" % ("-causal" if causal else ""))

        gF = jax.grad(lambda qq: jnp.sum(flashAttention(qq, k, v, causal)
                                         .astype(jnp.float32) ** 2))(q)
        gX = jax.grad(lambda qq: jnp.sum(attention(qq, k, v, causal=causal)
                                         .astype(jnp.float32) ** 2))(q)
        assertClose(gF, gX, 5e-2, "flash-bwd%s" % ("-causal" if causal else ""))

    # -- conv kernels: forced dispatch, tally-verified -------------------------
    from puzzlelib_tpu import config as Config
    from puzzlelib_tpu.ops import conv as convOps

    x = (jax.random.normal(key, (8, 128, 28, 28), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (128, 128, 3, 3), jnp.float32) * 0.05).astype(jnp.bfloat16)
    bz = jnp.zeros((128, ), jnp.bfloat16)

    Config.convAlgo = "xla"
    convOps.convNd.clear_cache()
    ref = convOps.convNd(x, w, bz, (1, 1), (1, 1), (1, 1), 1)

    Config.convAlgo = "winograd"
    convOps.resetDispatchCaches()
    convOps.convNd.clear_cache()
    before = convOps.dispatchStats["winograd"]
    out = convOps.convNd(x, w, bz, (1, 1), (1, 1), (1, 1), 1)

    if convOps.dispatchStats["winograd"] == before:
        raise AssertionError(
            "winograd kernel did NOT run (dispatch fell back to XLA)")
    assertClose(out, ref, 3e-2, "winograd")

    # transform-domain bwd-filter kernel
    from puzzlelib_tpu.ops.pallas import winograd as pwino

    xl = jnp.transpose(x, (0, 2, 3, 1))
    dy = (jax.random.normal(key, (8, 28, 28, 128), jnp.float32) * 0.1).astype(jnp.bfloat16)
    dwP = pwino.filterGradNHWC(xl, dy, (1, 1))

    Config.convAlgo = "xla"
    convOps.convNd.clear_cache()
    dwX = convOps._filterGradDenseNhwc(
        jnp.transpose(xl, (0, 3, 1, 2)), jnp.transpose(dy, (0, 3, 1, 2)),
        (3, 3), (1, 1), (1, 1), (1, 1))
    assertClose(dwP, dwX, 3e-2, "winoFG")

    Config.convAlgo = "auto"
    convOps.resetDispatchCaches()

    # -- Pallas GEMM tiles -----------------------------------------------------
    from puzzlelib_tpu.ops.pallas import matmul as pmm

    a = (jax.random.normal(key, (1024, 1024), jnp.float32) * 0.3).astype(jnp.bfloat16)
    bm = (jax.random.normal(ks[1], (1024, 1024), jnp.float32) * 0.3).astype(jnp.bfloat16)
    assertClose(pmm.matmul(a, bm), jnp.dot(a, bm, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16), 2e-2, "gemm")

    print("ALL PALLAS PATHS OK", flush=True)


if __name__ == "__main__":
    main()
