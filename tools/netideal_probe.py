"""Net-scale speed-of-light probe: a hand-written, end-to-end NHWC bf16
train step for the VGG-16 / ResNet-50 bodies, outside the Module layer.

Answers the round-4 question "kernels measure 85-94% of peak, the fused
Module step runs at 6-12% MFU - what CAN a TPU do on this net?" by timing
the same math (fwd + bwd + momentum update, cross-entropy) written the way
XLA wants it: channels-last everywhere, no layout flips, reshape-trick
non-overlapping maxpool, f32 master weights with bf16 compute.

Run:  python tools/netideal_probe.py --net vgg16 --batch 32 [--steps 6]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


BF16_PEAK = 197e12


# -- building blocks (all NHWC) ----------------------------------------------

def conv(x, w, stride=1, pad="SAME"):
    # bf16 in/out: the MXU accumulates bf16 contractions in f32 internally;
    # keeping the output bf16 keeps fwd/bwd cotangent dtypes aligned
    return lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def maxpool2x2(x):
    n, h, w, c = x.shape
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(xr, axis=4), axis=2)


def vggParams(key, cfg, nclass=1000, indim=3):
    params = []
    cin = indim
    for v in cfg:
        if v == "M":
            continue
        key, k1 = jax.random.split(key)
        params.append((jax.random.normal(k1, (3, 3, cin, v), jnp.float32) * 0.05,
                       jnp.zeros((v, ), jnp.float32)))
        cin = v

    key, k1, k2, k3 = jax.random.split(key, 4)
    params.append((jax.random.normal(k1, (7 * 7 * 512, 4096), jnp.float32) * 0.01,
                   jnp.zeros((4096, ), jnp.float32)))
    params.append((jax.random.normal(k2, (4096, 4096), jnp.float32) * 0.01,
                   jnp.zeros((4096, ), jnp.float32)))
    params.append((jax.random.normal(k3, (4096, nclass), jnp.float32) * 0.01,
                   jnp.zeros((nclass, ), jnp.float32)))
    return params


VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


def vggApply(params, x, cfg):
    """x NHWC bf16; params f32 (cast to bf16 at use: master-weight discipline)."""
    i = 0
    for v in cfg:
        if v == "M":
            x = maxpool2x2(x)
            continue
        w, b = params[i]
        i += 1
        x = conv(x, w.astype(jnp.bfloat16))
        x = jnp.maximum(x + b.astype(x.dtype), 0.0)

    x = x.reshape(x.shape[0], -1)
    for j, (w, b) in enumerate(params[i:]):
        x = jnp.dot(x, w.astype(jnp.bfloat16)) + b.astype(jnp.bfloat16)
        x = jnp.maximum(x, 0.0) if j < 2 else x
    return x


def crossEntropy(logits, labels):
    lf = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lf, axis=1)
    picked = jnp.take_along_axis(lf, labels[:, None], axis=1)[:, 0]
    return jnp.mean(lse - picked)


def vggFlops(batch, cfg, nclass=1000):
    total, cin, hw = 0.0, 3, 224
    for v in cfg:
        if v == "M":
            hw //= 2
            continue
        total += 2.0 * batch * hw * hw * 3 * 3 * cin * v
        cin = v
    total += 2.0 * batch * (7 * 7 * 512 * 4096 + 4096 * 4096 + 4096 * nclass)
    return total


# -- train step ---------------------------------------------------------------

def makeStep(applyFn, lossArgsFn, lr=0.01, mom=0.9):
    def loss(params, batch):
        return lossArgsFn(applyFn(params, *batch[:-1]), batch[-1])

    @partial(jax.jit, static_argnames=("nsteps", ))
    def manySteps(params, vel, data, labels, nsteps):
        def body(carry, _):
            p, v = carry
            g = jax.grad(loss)(p, (data, labels))
            v = jax.tree.map(lambda vi, gi: mom * vi - lr * gi, v, g)
            p = jax.tree.map(lambda pi, vi: pi + vi, p, v)
            return (p, v), None

        (p, v), _ = lax.scan(body, (params, vel), None, length=nsteps)
        return p, v

    return manySteps


def fence(tree):
    leaf = jax.tree.leaves(tree)[-1]
    np.asarray(leaf.ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="vgg16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    from puzzlelib_tpu.benchmarks import enableCompileCache
    enableCompileCache()

    key = jax.random.key(0)
    data = (jax.random.normal(key, (args.batch, 224, 224, 3), jnp.float32) * 0.3
            ).astype(jnp.bfloat16)
    labels = jax.random.randint(key, (args.batch, ), 0, 1000)

    if args.net == "vgg16":
        params = vggParams(key, VGG16_CFG)
        apply = partial(vggApply, cfg=VGG16_CFG)
        flops = 3.0 * vggFlops(args.batch, VGG16_CFG)   # fwd + bwdD + bwdW
    else:
        raise SystemExit("unknown net %s" % args.net)

    vel = jax.tree.map(jnp.zeros_like, params)
    step = makeStep(apply, crossEntropy)

    k = args.steps

    def run(p, v, n):
        p, v = step(p, v, data, labels, n)
        fence(p)
        return p, v

    t0 = time.perf_counter()
    p, v = run(params, vel, k)          # compile k
    print("compile(k) %.1fs" % (time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    run(params, vel, 2 * k)             # compile 2k
    print("compile(2k) %.1fs" % (time.perf_counter() - t0), flush=True)

    def minTime(n, tries=3):
        best = float("inf")
        for _ in range(tries):
            t = time.perf_counter()
            run(params, vel, n)
            best = min(best, time.perf_counter() - t)
        return best

    t1, t2 = minTime(k), minTime(2 * k)
    secs = (t2 - t1) / k
    print("%s NHWC-ideal train: %.2f ms/step, %.1f img/s, %.1f TF/s (%.0f%% of bf16 peak)" % (
        args.net, secs * 1e3, args.batch / secs, flops / secs / 1e12,
        flops / secs / BF16_PEAK * 100))


if __name__ == "__main__":
    main()
