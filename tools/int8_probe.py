"""int8/bf16 kernel-rate with CHAINED big GEMMs.

Hypothesis: the recorded int8 deficit (257/394 = 65%) is the fixed ~9 ms
relay dispatch+tick cost on a single 22 ms kernel — the same absolute
overhead that turns bf16's ~100%-of-peak kernel into the recorded 83%.
Chaining reps inside one program amortizes it away and reveals the true
kernel rate for both dtypes.

Run: python tools/int8_probe.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from puzzlelib_tpu.benchmarks import enableCompileCache


def fence(x):
    return np.asarray(x.ravel()[:1])


def chainRate(dot, a, b, vary, flops, reps, iters=2):
    @jax.jit
    def chained(a, b):
        acc = None
        for i in range(reps):
            out = dot(a, vary(b, i))
            piece = out.ravel()[:8]
            acc = piece if acc is None else acc + piece
        return acc

    t0 = time.time()
    fence(chained(a, b))
    compileSecs = time.time() - t0

    start = time.perf_counter()
    for _ in range(iters):
        out = chained(a, b)
    fence(out)
    secs = (time.perf_counter() - start) / iters / reps

    return secs, compileSecs


def main():
    enableCompileCache()

    m, k, n = 8192, 65536, 8192
    flops = 2.0 * m * k * n

    kA, kB = jax.random.split(jax.random.key(0))

    # -- bf16 ---------------------------------------------------------------
    a = (jax.random.normal(kA, (m, k), jnp.float32) * 0.1).astype(jnp.bfloat16)
    b = (jax.random.normal(kB, (k, n), jnp.float32) * 0.1).astype(jnp.bfloat16)
    fence(a)

    dotBf = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT).astype(jnp.bfloat16)

    for reps in (1, 4):
        secs, comp = chainRate(dotBf, a, b, lambda y, i: y + jnp.bfloat16(i * 2 ** -8),
                               flops, reps)
        print("bf16 reps=%d: %8.2f ms/gemm  %7.2f TF/s (%5.1f%% of 197)  [compile %.0fs]"
              % (reps, secs * 1e3, flops / secs / 1e12, flops / secs / 197e12 * 100, comp))

    del a, b

    # -- int8 ---------------------------------------------------------------
    ai = jax.random.randint(kA, (m, k), -127, 127, jnp.int8)
    bi = jax.random.randint(kB, (k, n), -127, 127, jnp.int8)
    fence(ai)

    dotI8 = lambda x, y: jax.lax.dot_general(
        x, y, (((1, ), (0, )), ((), ())), preferred_element_type=jnp.int32)

    for reps in (1, 4, 8):
        secs, comp = chainRate(dotI8, ai, bi, lambda y, i: y ^ jnp.int8(i),
                               flops, reps)
        print("int8 reps=%d: %8.2f ms/gemm  %7.2f TOP/s (%5.1f%% of 394)  [compile %.0fs]"
              % (reps, secs * 1e3, flops / secs / 1e12, flops / secs / 394e12 * 100, comp))


if __name__ == "__main__":
    main()
