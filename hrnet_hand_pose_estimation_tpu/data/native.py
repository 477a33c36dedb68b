"""ctypes bindings for the native host-pipeline kernels (native/fastops.cpp).

Auto-builds the shared library on first use if the toolchain is present;
every entry point has a numpy fallback so the framework never hard-depends
on the native build.  Use ``HANDPOSE_NO_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..ops.targets import gaussian_targets_np
from .transforms import IMAGENET_MEAN, IMAGENET_STD

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _candidate_paths() -> list:
    """Search order: explicit env override, the installed package copy
    (setup.py builds it into the package), then the repo-checkout native/
    dir (auto-built on first use)."""
    paths = []
    if os.environ.get("HANDPOSE_NATIVE_LIB"):
        paths.append(os.environ["HANDPOSE_NATIVE_LIB"])
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths.append(os.path.join(pkg, "libfastops.so"))
    paths.append(os.path.join(_native_dir(), "libfastops.so"))
    return paths


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("HANDPOSE_NO_NATIVE"):
        return None
    so = next((p for p in _candidate_paths() if os.path.exists(p)), None)
    if so is None:
        so = os.path.join(_native_dir(), "libfastops.so")
        try:
            subprocess.run(["bash", os.path.join(_native_dir(), "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.normalize_collate_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.gaussian_targets.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
    lib.fastops_num_threads.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def normalize_collate(images_u8: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 -> normalised float32, native when available."""
    assert images_u8.dtype == np.uint8 and images_u8.ndim == 4
    lib = load_library()
    if lib is None:
        return ((images_u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    b = images_u8.shape[0]
    hw3 = int(np.prod(images_u8.shape[1:]))
    src = np.ascontiguousarray(images_u8)
    out = np.empty((b, *images_u8.shape[1:]), np.float32)
    mean = np.ascontiguousarray(IMAGENET_MEAN)
    std = np.ascontiguousarray(IMAGENET_STD)
    lib.normalize_collate_u8(src.ctypes.data, out.ctypes.data, b, hw3,
                             mean.ctypes.data, std.ctypes.data)
    return out


def gaussian_targets_native(joints: np.ndarray, visibility: np.ndarray,
                            output_res: int, sigma: float = 2.0) -> np.ndarray:
    """(B, K, 2), (B, K) -> (B, res, res, K); bit-matches ops/targets."""
    lib = load_library()
    if lib is None:
        return gaussian_targets_np(joints, visibility, output_res, sigma)
    j = np.ascontiguousarray(joints, np.float32)
    v = np.ascontiguousarray(visibility, np.float32)
    b, k = j.shape[:2]
    out = np.empty((b, output_res, output_res, k), np.float32)
    lib.gaussian_targets(j.ctypes.data, v.ctypes.data, out.ctypes.data,
                         b, k, output_res, float(sigma))
    return out


def native_available() -> bool:
    return load_library() is not None
