"""Native host-pipeline kernels vs numpy references."""

import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.data.native import (
    gaussian_targets_native,
    native_available,
    normalize_collate,
)
from hrnet_hand_pose_estimation_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets_np


def test_normalize_collate_matches_numpy(rng):
    imgs = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    want = ((imgs.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    got = normalize_collate(imgs)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_gaussian_targets_native_matches_numpy(rng):
    joints = rng.uniform(-3, 19, size=(6, 21, 2)).astype(np.float32)
    vis = (rng.uniform(size=(6, 21)) > 0.3).astype(np.float32)
    for sigma in (1.0, 2.0):
        want = gaussian_targets_np(joints, vis, 16, sigma)
        got = gaussian_targets_native(joints, vis, 16, sigma)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_fallback_when_disabled(monkeypatch, rng):
    import hrnet_hand_pose_estimation_tpu.data.native as native

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    imgs = rng.integers(0, 256, size=(2, 8, 8, 3)).astype(np.uint8)
    want = ((imgs.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(native.normalize_collate(imgs), want, atol=2e-6)
