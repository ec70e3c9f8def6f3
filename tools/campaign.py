"""One-shot honest measurement campaign: run everything pending in a single
TPU window (the relay wedges for hours at a time - make each window count).

Sections run in order, each wrapped (a failure moves on), results appended
to tools/campaign_results.txt.  Re-runs skip sections already marked done
in that file; pass section names to force specific ones.

Run: python tools/campaign.py [fg convspeed gemm algochoice attn nets]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "campaign_results.txt")


def log(line):
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def done(section):
    if not os.path.exists(LOG):
        return False
    text = open(LOG).read()
    # two failures = a real bug, not relay flakiness; stop burning windows
    return ("=== DONE %s" % section) in text \
        or text.count("=== FAILED %s" % section) >= 2


def runSection(name, fn):
    if done(name):
        log("# skipping %s (already done; delete campaign_results.txt to redo)" % name)
        return

    log("=== BEGIN %s @ %s" % (name, time.strftime("%H:%M:%S")))
    t = time.time()
    try:
        fn()
        log("=== DONE %s (%.0fs)" % (name, time.time() - t))
    except Exception as exc:
        log("=== FAILED %s: %s" % (name, str(exc)[:500]))


def capture(argv):
    """Run a CLI in-subprocess, tee output into the log."""
    r = subprocess.run([sys.executable] + argv, capture_output=True, text=True,
                       timeout=3600, cwd="/root/repo")
    for ln in (r.stdout + r.stderr).splitlines():
        if "WARNING" in ln or "experimental" in ln:
            continue
        log("  " + ln)
    if r.returncode != 0:
        raise RuntimeError("exit %d" % r.returncode)


def algoChoice():
    import jax.numpy as jnp
    from puzzlelib_tpu.benchmarks import enableCompileCache
    from puzzlelib_tpu.ops import conv as opsconv

    enableCompileCache()

    shapes = [
        ((32, 256, 56, 56), (256, 256, 3, 3), 1),
        ((32, 512, 28, 28), (512, 512, 3, 3), 1),
        ((16, 128, 112, 112), (128, 128, 3, 3), 1),
        ((32, 128, 56, 56), (128, 128, 3, 3), 1),
        ((16, 256, 112, 112), (256, 256, 3, 3), 1),
    ]

    for ds, ws, p in shapes:
        res = opsconv.measureAlgoChoice(ds, ws, (1, 1), (p, p), (1, 1), 1)
        log("  %s %s -> %s" % (ds, ws, res))


def main():
    sections = sys.argv[1:] or ["fg", "convspeed", "fg11", "gemm", "int8",
                                "algochoice", "attn", "pallas-assert", "nets",
                                "engines", "profiles", "verify", "bench"]

    # probe first: a wedged relay should fail fast, not eat the window
    import numpy as np
    import jax.numpy as jnp
    t = time.time()
    a = jnp.ones((512, 512), jnp.bfloat16)
    np.asarray((a @ a).ravel()[:1])
    log("# relay alive (probe %.0fs) @ %s" % (time.time() - t, time.strftime("%H:%M:%S")))

    for name in sections:
        if name == "fg":
            runSection("fg", lambda: capture(["tools/remeasure_bench.py", "fg"]))
        elif name == "convspeed":
            runSection("convspeed", lambda: capture(["tools/remeasure_bench.py", "convspeed"]))
        elif name == "gemm":
            runSection("gemm", lambda: capture(["tools/remeasure_bench.py", "gemm"]))
        elif name == "fg11":
            runSection("fg11", lambda: capture(["tools/remeasure_bench.py", "fg11"]))
        elif name == "int8":
            runSection("int8", lambda: capture(["tools/remeasure_bench.py", "int8"]))
        elif name == "algochoice":
            runSection("algochoice", algoChoice)
        elif name == "attn":
            runSection("attn", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.attnspeed", "--seqs", "2048,4096"]))
        elif name == "nets":
            runSection("vgg16-many", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "vgg16",
                 "--batch", "32", "--dtype", "bfloat16", "--many", "4"]))
            runSection("resnet50-many", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "resnet50",
                 "--batch", "32", "--dtype", "bfloat16", "--many", "4"]))
        elif name == "engines":
            # serving throughput past the relay dispatch wall: eager vs
            # Engine.many marginal, f32 + int8 (RTEngine throughput role)
            runSection("engines-b128", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.enginespeed", "--net", "nin",
                 "--batch", "128", "--dtypes", "float32,int8", "--many", "8"]))
            runSection("engines-b512", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.enginespeed", "--net", "nin",
                 "--batch", "512", "--dtypes", "float32,int8", "--many", "4"]))
        elif name == "pallas-assert":
            # every claimed-Pallas config must compile AND run on-chip and
            # match XLA numerically; a Mosaic regression fails the section
            # loudly instead of silently rerouting to the fallback
            runSection("pallas-assert", lambda: capture(["tools/pallas_assert.py"]))
        elif name == "verify":
            # end-to-end public-API drive ON THE CHIP (the /verify TPU leg):
            # Trainer loss decrease, Validator, Calculator, checkpoint
            runSection("verify", lambda: capture(["tools/verify_drive.py"]))
        elif name == "bench":
            runSection("bench", lambda: capture(["bench.py"]))
        elif name == "profiles":
            runSection("vgg16-profile", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "vgg16",
                 "--batch", "32", "--dtype", "bfloat16", "--profile"]))
            runSection("resnet50-profile", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "resnet50",
                 "--batch", "32", "--dtype", "bfloat16", "--profile"]))


if __name__ == "__main__":
    main()
