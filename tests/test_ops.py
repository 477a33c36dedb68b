"""Op-level parity tests: decoding, targets, upsampling, flips.

Each op is checked against an independent dense/naive implementation that
transliterates the reference's semantics (loops and all), so the vectorised
TPU versions are verified against the reference behaviour rather than
against themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.decode import (
    decode_heatmaps,
    gaussian_modulate,
    hard_argmax,
    heatmap_maxvals,
    soft_argmax,
    spatial_softmax,
    taylor_refine,
)
from hrnet_hand_pose_estimation_tpu.ops.flip import flip_back, fliplr_joints, shift_heatmap
from hrnet_hand_pose_estimation_tpu.ops.targets import (
    gaussian_centermap,
    gaussian_targets,
    gaussian_targets_np,
)
from hrnet_hand_pose_estimation_tpu.ops.upsample import (
    upsample_bilinear_align_corners,
    upsample_nearest,
)


# ---------------------------------------------------------------- decoding
def test_soft_argmax_recovers_peak(rng):
    """Gaussian-bump logits + sharp temperature -> expectation near the peak."""
    b, h, w, k = 3, 64, 64, 21
    centers = rng.uniform(8, 56, size=(b, k, 2)).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    logits = np.zeros((b, h, w, k), np.float32)
    for bi in range(b):
        for ki in range(k):
            cu, cv = centers[bi, ki]
            logits[bi, :, :, ki] = -((xs - cu) ** 2 + (ys - cv) ** 2) / (2 * 3.0**2)
    probs = spatial_softmax(jnp.asarray(logits), 4.0)
    soft = np.asarray(soft_argmax(probs))
    assert np.abs(soft - centers).max() < 0.75


def test_soft_argmax_exact_on_delta():
    h = w = 64
    probs = np.zeros((1, h, w, 2), np.float32)
    probs[0, 17, 42, 0] = 1.0
    probs[0, 5, 9, 1] = 1.0
    out = np.asarray(soft_argmax(jnp.asarray(probs)))
    np.testing.assert_allclose(out[0, 0], [42.0, 17.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 1], [9.0, 5.0], atol=1e-5)


def test_hard_argmax_matches_reference_semantics(rng):
    """Reference get_final_preds max branch (heatmap_decoding.py:103-107)."""
    hms = rng.normal(size=(2, 64, 64, 21)).astype(np.float32)
    out = np.asarray(hard_argmax(jnp.asarray(hms)))
    # naive loop
    for b in range(2):
        for k in range(21):
            flat = hms[b, :, :, k].reshape(-1)
            idx = flat.argmax()
            assert out[b, k, 0] == idx % 64
            assert out[b, k, 1] == idx // 64


def test_decode_dispatch(rng):
    hms = jnp.asarray(rng.normal(size=(2, 16, 16, 21)).astype(np.float32))
    probs = spatial_softmax(hms)
    assert decode_heatmaps(probs, True).shape == (2, 21, 2)
    assert decode_heatmaps(hms, False).shape == (2, 21, 2)
    assert heatmap_maxvals(hms).shape == (2, 21, 1)


def test_spatial_softmax_normalises(rng):
    hms = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    p = np.asarray(spatial_softmax(hms, 2.5))
    np.testing.assert_allclose(p.sum(axis=(1, 2)), 1.0, atol=1e-5)


def test_taylor_refine_moves_toward_true_peak():
    """A quadratic bump with sub-pixel max: refinement should recover it."""
    h = w = 32
    true = np.array([14.3, 9.7])  # [u, v]
    ys, xs = np.mgrid[0:h, 0:w]
    g = np.exp(-((xs - true[0]) ** 2 + (ys - true[1]) ** 2) / (2 * 2.0**2))
    hm = jnp.asarray(np.log(g + 1e-10)[None, :, :, None].astype(np.float32))
    coarse = hard_argmax(jnp.exp(hm))
    refined = np.asarray(taylor_refine(hm, coarse))[0, 0]
    assert np.abs(refined - true).max() < 0.1


def test_gaussian_modulate_preserves_peak_location(rng):
    hm = np.zeros((1, 32, 32, 1), np.float32)
    hm[0, 10, 20, 0] = 1.0
    hm[0, 11, 20, 0] = 0.9
    out = np.asarray(gaussian_modulate(jnp.asarray(hm), kernel=7))
    assert out[0].max() == pytest.approx(1.0, abs=1e-5)
    assert np.unravel_index(out[0, :, :, 0].argmax(), (32, 32)) == (10, 20)


# ---------------------------------------------------------------- targets
def _reference_gaussian(joints, vis, res, sigma):
    """Transliteration of reference HeatmapGenerator.__call__ (:28-53)."""
    k = joints.shape[0]
    hms = np.zeros((k, res, res), dtype=np.float32)
    size = 6 * sigma + 3
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = 3 * sigma + 1
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
    for idx in range(k):
        if vis[idx] <= 0:
            continue
        xx, yy = int(joints[idx, 0]), int(joints[idx, 1])
        if xx < 0 or yy < 0 or xx >= res or yy >= res:
            continue
        ul = int(np.round(xx - 3 * sigma - 1)), int(np.round(yy - 3 * sigma - 1))
        br = int(np.round(xx + 3 * sigma + 2)), int(np.round(yy + 3 * sigma + 2))
        c, d = max(0, -ul[0]), min(br[0], res) - ul[0]
        a, b = max(0, -ul[1]), min(br[1], res) - ul[1]
        cc, dd = max(0, ul[0]), min(br[0], res)
        aa, bb = max(0, ul[1]), min(br[1], res)
        hms[idx, aa:bb, cc:dd] = np.maximum(hms[idx, aa:bb, cc:dd], g[a:b, c:d])
    return hms


@pytest.mark.parametrize("sigma", [1, 2, 3])
def test_gaussian_targets_match_reference(rng, sigma):
    res = 64
    joints = rng.uniform(-5, res + 5, size=(4, 21, 2)).astype(np.float32)
    vis = (rng.uniform(size=(4, 21)) > 0.3).astype(np.float32)
    ours = np.asarray(gaussian_targets(jnp.asarray(joints), jnp.asarray(vis), res, sigma))
    for b in range(4):
        ref = _reference_gaussian(joints[b], vis[b], res, sigma)  # (K, H, W)
        np.testing.assert_allclose(ours[b].transpose(2, 0, 1), ref, atol=1e-6)


def test_gaussian_targets_np_matches_jax(rng):
    joints = rng.uniform(0, 64, size=(2, 21, 2)).astype(np.float32)
    vis = np.ones((2, 21), np.float32)
    a = np.asarray(gaussian_targets(jnp.asarray(joints), jnp.asarray(vis), 64, 2))
    b = gaussian_targets_np(joints, vis, 64, 2)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_centermap_peak():
    cm = np.asarray(gaussian_centermap(jnp.asarray([[128.0, 64.0]]), 256, 21.0))
    assert cm.shape == (1, 256, 256, 1)
    assert cm[0, 64, 128, 0] == pytest.approx(1.0)


# ---------------------------------------------------------------- upsample
def test_nearest_matches_torch_semantics(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(upsample_nearest(jnp.asarray(x), 4))
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(out[:, ::4, ::4, :], x)
    np.testing.assert_allclose(out[:, 3::4, 3::4, :], x)


def test_bilinear_align_corners_against_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    g = torch.Generator().manual_seed(3)
    for src, dst in [(32, 64), (16, 64), (8, 64), (5, 13)]:
        x = torch.randn(2, 3, src, src, generator=g)
        want = F.interpolate(x, size=(dst, dst), mode="bilinear", align_corners=True).numpy()
        got = np.asarray(
            upsample_bilinear_align_corners(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (dst, dst))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)  # f32 matmul vs lerp rounding


# ---------------------------------------------------------------- flips
def test_flip_back_roundtrip(rng):
    hms = jnp.asarray(rng.normal(size=(2, 16, 16, 21)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(flip_back(flip_back(hms))), np.asarray(hms))


def test_flip_back_pairs():
    hms = np.zeros((1, 4, 4, 2), np.float32)
    hms[0, 1, 0, 0] = 1.0
    out = np.asarray(flip_back(jnp.asarray(hms), [(0, 1)]))
    assert out[0, 1, 3, 1] == 1.0  # mirrored and swapped to channel 1
    assert out[0, 1, 3, 0] == 0.0


def test_shift_heatmap():
    hms = np.arange(16, dtype=np.float32).reshape(1, 1, 16, 1)
    out = np.asarray(shift_heatmap(jnp.asarray(hms)))
    np.testing.assert_allclose(out[0, 0, 1:, 0], hms[0, 0, :-1, 0])


def test_fliplr_joints():
    joints = jnp.asarray(np.array([[[3.0, 5.0], [10.0, 2.0]]], np.float32))
    vis = jnp.ones((1, 2, 1))
    fj, _ = fliplr_joints(joints, vis, width=64)
    np.testing.assert_allclose(np.asarray(fj)[0, :, 0], [60.0, 53.0])
