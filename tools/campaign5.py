"""Round-5 one-shot TPU measurement campaign.

Same discipline as tools/campaign.py (the relay wedges for hours — make each
window count): sections run in order, each wrapped, results appended to
tools/campaign5_results.txt; re-runs skip sections already DONE (or failed
twice).  Pass section names to force specific ones.

Sections (VERDICT round-4 items in parentheses):
  digitsnin        NIN at the CIFAR topology trained on real data, on chip (#6)
  ctctrain         CTC end-to-end training demo on chip (#9)
  vgg16-profile    per-layer attribution with the row-retry + operand fixes (#2)
  resnet50-profile same for ResNet-50 (#2)
  tpu-tests        the non-excluded unittester suite on the chip (#5)
  engines-large    bf16 vs int8 serving at batch >= 1024 (#8)
  fusedval         FusedValidator/FusedCalculator vs eager on chip (round-5 feature)
  bench            headline JSON (driver also runs this at round end)

Run: python tools/campaign5.py [sections...]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "campaign5_results.txt")


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
        log("# skipping %s (already done)" % name)
        return

    log("=== BEGIN %s @ %s" % (name, time.strftime("%H:%M:%S")))
    t = time.time()
    try:
        fn()
        log("=== DONE %s (%.0fs)" % (name, time.time() - t))
    except Exception as exc:
        log("=== FAILED %s: %s" % (name, str(exc)[:500]))


def capture(argv, timeout=3600):
    """Run a CLI in-subprocess, tee output into the log."""
    r = subprocess.run([sys.executable] + argv, capture_output=True, text=True,
                       timeout=timeout, cwd="/root/repo")
    for ln in (r.stdout + r.stderr).splitlines():
        if "WARNING" in ln or "experimental" in ln:
            continue
        log("  " + ln)
    if r.returncode != 0:
        raise RuntimeError("exit %d" % r.returncode)


def main():
    # bench2 FIRST: the first bench pass lost its lenet phase to a 600 s
    # cold-compile timeout through the relay (recorded value 0.0); rerunning
    # with a longer phase budget both lands a real headline in this log and
    # warms the compile cache for the driver's own end-of-round bench run.
    # tpu-tests LAST: it is the longest section (up to 2 h after the 1 h
    # rebound) and the one that wedged the relay mid-suite on 2026-08-20 —
    # everything cheap must land before it gets another window.
    sections = sys.argv[1:] or ["bench2", "digitsnin", "ctctrain",
                                "vgg16-profile", "resnet50-profile",
                                "engines-large", "fusedval", "nets-b128",
                                "bench", "vgg16-profile2", "digitsnin2",
                                "benchwarm", "eagerwarm", "tpu-tests", "tpu-tests2"]

    # probe first: a wedged relay should fail fast, not eat the window
    import numpy as np
    import jax.numpy as jnp
    t = time.time()
    a = jnp.ones((512, 512), jnp.bfloat16)
    np.asarray((a @ a).ravel()[:1])
    log("# relay alive (probe %.0fs) @ %s" % (time.time() - t, time.strftime("%H:%M:%S")))

    for name in sections:
        if name == "digitsnin":
            runSection("digitsnin", lambda: capture(["testlib/digitsnin.py", "300"]))
        elif name == "ctctrain":
            runSection("ctctrain", lambda: capture(["testlib/ctctrain.py", "200"]))
        elif name == "vgg16-profile":
            runSection("vgg16-profile", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "vgg16",
                 "--batch", "32", "--dtype", "bfloat16", "--profile"]))
        elif name == "resnet50-profile":
            runSection("resnet50-profile", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "resnet50",
                 "--batch", "32", "--dtype", "bfloat16", "--profile"]))
        elif name == "tpu-tests":
            # 1 h bound, not 2: the retry runs with the compile cache warm
            # (the first pass spent most of its hour compiling before the
            # relay wedged), and the chip must be free for the end-of-round
            # bench run
            runSection("tpu-tests", lambda: capture(
                ["-m", "puzzlelib_tpu.unittester", "--backend", "tpu"], timeout=3600))
        elif name == "engines-large":
            runSection("engines-b1024", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.enginespeed", "--net", "nin",
                 "--batch", "1024", "--dtypes", "bfloat16,int8", "--many", "8"]))
            runSection("engines-b2048", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.enginespeed", "--net", "nin",
                 "--batch", "2048", "--dtypes", "bfloat16,int8", "--many", "4"]))
        elif name == "fusedval":
            runSection("fusedval", lambda: capture(["tools/fusedval_drive.py"]))
        elif name == "nets-b128":
            # batch scaling: the b32 rows are the BASELINE config; these show
            # where whole-net MFU lands once the early-layer lane geometry is
            # amortized over a production-serving batch
            runSection("vgg16-b128", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "vgg16",
                 "--batch", "128", "--dtype", "bfloat16", "--many", "4"]))
            runSection("resnet50-b128", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "resnet50",
                 "--batch", "128", "--dtype", "bfloat16", "--many", "4"]))
        elif name == "bench":
            runSection("bench", lambda: capture(["bench.py"]))
        elif name == "bench2":
            def benchLong():
                os.environ["BENCH_PHASE_TIMEOUT"] = "1500"
                os.environ["BENCH_WATCHDOG"] = "3300"
                capture(["bench.py"], timeout=3600)
            runSection("bench2", benchLong)
        elif name == "tpu-tests2":
            # the 09:08 retry reached 184 passed / 3 failed in 53:39 — the 3
            # were test-tolerance bugs (flash-vs-XLA f32 rtol, Gelu VPU tanh
            # tier), fixed in the working tree; warm compile cache makes this
            # pass much faster than the first
            runSection("tpu-tests2", lambda: capture(
                ["-m", "puzzlelib_tpu.unittester", "--backend", "tpu"], timeout=3600))
        elif name == "digitsnin2":
            # retry of the NIN accuracy artifact with the GradClip stabilizer:
            # the unclipped MomentumSGD 0.1/0.9 recipe is chaotic at 11
            # steps/epoch (CPU and TPU both reproduce a dead-ReLU collapse on
            # some trajectories; the same recipe converged to 98.3% on others)
            runSection("digitsnin2", lambda: capture(["testlib/digitsnin.py", "300"]))
        elif name == "eagerwarm":
            # the eager per-op baseline needs ~40 executables compiled through
            # the relay; two 360 s attempts have not gotten through them all,
            # so vs_baseline is still 0.0 — one long dedicated pass fills the
            # compile cache and records the ratio
            def eagerLong():
                os.environ["BENCH_EAGER_TIMEOUT"] = "1500"
                capture(["bench.py"], timeout=3300)
            runSection("eagerwarm", eagerLong)
        elif name == "benchwarm":
            # one more bench pass so the driver's end-of-round bench.py run
            # (cold process, 600 s/phase) finds every program — including the
            # eager phase's ~40 per-op executables — already in the on-disk
            # compile cache and can fill vs_baseline with a real ratio
            runSection("benchwarm", lambda: capture(["bench.py"], timeout=3000))
        elif name == "vgg16-profile2":
            # re-capture with the round-5 layerprofile fixes (zero-marginal
            # guard, noise-flagged rows, honest isolated-vs-fused footer);
            # the first vgg16-profile ran the pre-fix report code
            runSection("vgg16-profile2", lambda: capture(
                ["-m", "puzzlelib_tpu.benchmarks.netspeed", "--net", "vgg16",
                 "--batch", "32", "--dtype", "bfloat16", "--profile"]))


if __name__ == "__main__":
    main()
