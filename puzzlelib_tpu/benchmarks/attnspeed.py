"""Attention benchmark: Pallas flash (fwd+bwd via its custom VJP) vs XLA.

Times a full training step (grad of a scalar loss wrt q/k/v) per sequence
length.  Measured on v5e bf16 (b=4, h=8, d=64): flash wins 1.3x at seq 2048
and up to 1.9x at seq 4096 causal, while its backward is also ~5x closer to
the f32 oracle than XLA's bf16 VJP (probabilities stay f32 in VMEM).

Run:  python -m puzzlelib_tpu.benchmarks.attnspeed [--seqs 2048,4096]
"""

import argparse
import time

import numpy as np


def timeGrad(gradFn, q, k, v, causal, reps=(4, 12)):
    """Honest marginal seconds per training step (see benchmarks.timing):
    delta-perturbed q defeats loop-invariant hoisting inside the scan."""
    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu.benchmarks.timing import deltaBank, marginalTime

    rows = min(8, q.shape[1])
    deltas = deltaBank((rows, ) + q.shape[2:], q.dtype, max(reps), seed=5)

    def step(i, q, k, v, d):
        dq, dk, dv = gradFn(q.at[:, :rows].add(d[i]), k, v, causal)
        return (jnp.max(dq.astype(jnp.float32))
                + jnp.max(dk.astype(jnp.float32))
                + jnp.max(dv.astype(jnp.float32))).reshape(1)

    return marginalTime(step, (q, k, v, deltas), reps1=reps[0], reps2=reps[1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seqs", default="2048,4096")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from puzzlelib_tpu.benchmarks import enableCompileCache
    from puzzlelib_tpu.ops.pallas.flash import flashAttention
    from puzzlelib_tpu.ops.attention import attention

    enableCompileCache()

    if jax.devices()[0].platform == "cpu":
        print("# CPU platform: flash timings skipped (interpret mode only)")
        return

    b, h, d = args.batch, args.heads, args.dim

    def lossF(q, k, v, causal):
        return jnp.sum(flashAttention(q, k, v, causal, 256, 256, False).astype(jnp.float32) ** 2)

    def lossX(q, k, v, causal):
        return jnp.sum(attention(q, k, v, causal=causal).astype(jnp.float32) ** 2)

    gradF = jax.grad(lossF, argnums=(0, 1, 2))
    gradX = jax.grad(lossX, argnums=(0, 1, 2))

    for s in [int(x) for x in args.seqs.split(",")]:
        keys = jax.random.split(jax.random.key(1), 3)
        q, k, v = [(jax.random.normal(kk, (b, h, s, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
                   for kk in keys]

        flops = 4 * b * h * s * s * d * 3.5          # fwd + ~2.5x bwd

        for causal in (False, True):
            tF = timeGrad(gradF, q, k, v, causal)
            tX = timeGrad(gradX, q, k, v, causal)

            print("seq %5d causal=%d | flash %7.2f ms (%5.1f TF/s) | xla %7.2f ms (%5.1f TF/s) | %.2fx"
                  % (s, causal, tF * 1e3, flops / tF / 1e12, tX * 1e3, flops / tX / 1e12, tX / tF))

            # persist the winner in the measured dispatch table (what
            # attentionAlgo="auto" consults; ties go to XLA)
            from puzzlelib_tpu.ops import attention as attnops
            choice = "flash" if tF < tX * 0.97 else "xla"
            attnops._attnChoice[attnops._signature(b, h, s, d, causal, q.dtype)] = choice

    from puzzlelib_tpu.ops import attention as attnops
    print("dispatch table:", sorted(attnops._attnChoice.items()))


if __name__ == "__main__":
    main()
