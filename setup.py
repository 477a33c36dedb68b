"""Packaging entry: metadata lives in pyproject.toml.

The optional native host-pipeline library (native/fastops.cpp — uint8
normalize+collate and Gaussian target stamping for the CPU data path) is
compiled into the package when a C++ toolchain is available; everything it
accelerates has a pure-numpy fallback (data/native.py returns None and the
callers fall through), so the build is strictly best-effort.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        root = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(root, "native", "fastops.cpp")
        if not os.path.exists(src):
            return
        out_pkg = os.path.join(self.build_lib, "hrnet_hand_pose_estimation_tpu")
        os.makedirs(out_pkg, exist_ok=True)
        out = os.path.join(out_pkg, "libfastops.so")
        try:
            subprocess.run(
                ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", out],
                check=True, capture_output=True, timeout=180)
        except Exception:
            pass  # pure-numpy fallback covers every native entry point


setup(cmdclass={"build_py": BuildWithNative})
