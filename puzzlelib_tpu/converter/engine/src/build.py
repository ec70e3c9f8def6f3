"""Build the native PJRT serving driver with g++."""

import os
import subprocess


def buildDriver(outpath=None, log=True):
    src = os.path.dirname(os.path.abspath(__file__))

    if outpath is None:
        outpath = os.path.join(src, "pjrt_driver")

    cmd = [
        "g++", "-std=c++17", "-O2", "-Wall",
        os.path.join(src, "pjrt_driver.cpp"),
        "-I", src,
        "-ldl", "-o", outpath,
    ]

    if log:
        print("[engine] " + " ".join(cmd))

    subprocess.check_call(cmd)
    return outpath


if __name__ == "__main__":
    buildDriver()
