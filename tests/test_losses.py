"""Loss parity tests vs transliterated reference semantics (lib/core/loss.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.core import losses as L


def test_heatmap_loss_l2(rng):
    pred = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    # reference: ((pred-gt)**2).sum(-1).sum(-1).mean() on (B, K, H, W)
    want = ((pred - gt) ** 2).transpose(0, 3, 1, 2).sum(-1).sum(-1).mean()
    got = float(L.heatmap_loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert got == pytest.approx(want, rel=1e-5)


def test_heatmap_loss_l1(rng):
    pred = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    want = np.abs(pred - gt).transpose(0, 3, 1, 2).sum(-1).sum(-1).mean()
    got = float(L.heatmap_loss(jnp.asarray(pred), jnp.asarray(gt), mode="l1"))
    assert got == pytest.approx(want, rel=1e-5)


def test_joints_mse_loss_with_visibility(rng):
    p = rng.normal(size=(4, 21, 2)).astype(np.float32)
    g = rng.normal(size=(4, 21, 2)).astype(np.float32)
    v = (rng.uniform(size=(4, 21)) > 0.5).astype(np.float32)
    want = (np.linalg.norm(p - g, axis=2) * v).sum() / max(1, v.sum())
    got = float(L.joints_mse_loss(jnp.asarray(p), jnp.asarray(g), jnp.asarray(v)))
    assert got == pytest.approx(want, rel=1e-5)


def test_joints_mse_loss_no_visibility(rng):
    p = rng.normal(size=(4, 21, 2)).astype(np.float32)
    g = rng.normal(size=(4, 21, 2)).astype(np.float32)
    want = np.linalg.norm(p - g, axis=2).sum() / 21
    got = float(L.joints_mse_loss(jnp.asarray(p), jnp.asarray(g)))
    assert got == pytest.approx(want, rel=1e-5)


def test_joints_mae_loss(rng):
    p = rng.normal(size=(4, 21, 3)).astype(np.float32)
    g = rng.normal(size=(4, 21, 3)).astype(np.float32)
    v = (rng.uniform(size=(4, 21, 1)) > 0.5).astype(np.float32)
    want = (np.abs(g - p) * v).sum() / max(1, v.sum())
    got = float(L.joints_mae_loss(jnp.asarray(p), jnp.asarray(g), jnp.asarray(v)))
    assert got == pytest.approx(want, rel=1e-5)


def test_joints_3d_mse(rng):
    p = rng.normal(size=(4, 21, 3)).astype(np.float32)
    g = rng.normal(size=(4, 21, 3)).astype(np.float32)
    want = np.linalg.norm(g - p, axis=2).sum() / 21
    got = float(L.joints_3d_mse_loss(jnp.asarray(p), jnp.asarray(g)))
    assert got == pytest.approx(want, rel=1e-5)


def test_bone_length_loss_reference_traversal(rng):
    """Reference traverses consecutive joints (loss.py:164-174, with the
    unreachable wrist branch — see legends.BONE_PARENTS_REF)."""
    p = rng.normal(size=(3, 21, 3)).astype(np.float32)
    g = rng.normal(size=(3, 21, 3)).astype(np.float32)
    want = 0.0
    for b in range(3):
        for j in range(1, 21):
            bl_g = np.linalg.norm(g[b, j] - g[b, j - 1])
            bl_p = np.linalg.norm(p[b, j] - p[b, j - 1])
            want += (bl_g - bl_p) ** 2
    want /= 20
    got = float(L.bone_length_loss(jnp.asarray(p), jnp.asarray(g)))
    assert got == pytest.approx(want, rel=1e-4)


def test_joint_angle_loss_matches_naive(rng):
    p = rng.normal(size=(2, 21, 3)).astype(np.float32)
    want = 0.0
    for b in range(2):
        for f in range(5):
            j = p[b]
            b1 = j[f * 4 + 1] - j[f * 4]
            b2 = j[f * 4 + 2] - j[f * 4 + 1]
            b3 = j[f * 4 + 3] - j[f * 4 + 2]
            b4 = j[f * 4 + 4] - j[f * 4 + 3]
            rt, rm, rp = np.cross(b4, b3), np.cross(b3, b2), np.cross(b2, b1)
            want += np.dot(rp, b4) + np.dot(rm, b4)
            d1, d2 = np.dot(rt, rm), np.dot(rp, rm)
            if d1 < 0:
                want += d1**2
            if d2 < 0:
                want += d2**2
    got = float(L.joint_angle_loss(jnp.asarray(p)))
    assert got == pytest.approx(want, rel=1e-3)


def test_joint_angle_loss_2d_no_coplanarity(rng):
    p2 = rng.normal(size=(2, 21, 2)).astype(np.float32)
    got = float(L.joint_angle_loss(jnp.asarray(p2)))
    assert got >= 0.0  # only the rotation-consistency term, which is >= 0


def test_ohkm_loss_selects_topk(rng):
    out = rng.normal(size=(2, 8, 8, 21)).astype(np.float32)
    tgt = rng.normal(size=(2, 8, 8, 21)).astype(np.float32)
    tw = np.ones((2, 21), np.float32)
    got = float(L.joints_ohkm_mse_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(tw), topk=8))
    per_joint = 0.5 * ((out - tgt) ** 2).mean(axis=(1, 2))  # (B, K)
    want = np.mean([np.sort(per_joint[b])[-8:].sum() / 8 for b in range(2)])
    assert got == pytest.approx(want, rel=1e-5)


def test_volumetric_ce_loss(rng):
    b, n, k = 2, 8, 4
    xs = np.linspace(-1, 1, n)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    coord = np.broadcast_to(grid, (b, n, n, n, 3)).astype(np.float32)
    vol = rng.uniform(0.01, 1.0, size=(b, n, n, n, k)).astype(np.float32)
    kp = rng.uniform(-1, 1, size=(b, k, 3)).astype(np.float32)
    val = np.ones((b, k, 1), np.float32)
    got = float(L.volumetric_ce_loss(jnp.asarray(coord), jnp.asarray(vol), jnp.asarray(kp), jnp.asarray(val)))
    # naive
    want, cnt = 0.0, 0
    for bi in range(b):
        for ki in range(k):
            d = np.linalg.norm(coord[bi].reshape(-1, 3) - kp[bi, ki], axis=1)
            idx = np.unravel_index(d.argmin(), (n, n, n))
            want += -np.log(vol[bi][idx][ki] + 1e-6)
            cnt += 1
    want /= cnt
    assert got == pytest.approx(want, rel=1e-4)


def test_kcs_loss_zero_for_identical(rng):
    p = jnp.asarray(rng.normal(size=(2, 21, 3)).astype(np.float32))
    assert float(L.kcs_loss(p, p)) == 0.0


def test_scale_pose_invariances(rng):
    p = rng.normal(size=(3, 21, 3)).astype(np.float32)
    s = np.asarray(L.scale_pose(jnp.asarray(p)))
    # wrist at origin
    np.testing.assert_allclose(s[:, 0], 0.0, atol=1e-6)
    # reference bone length 1
    np.testing.assert_allclose(np.linalg.norm(s[:, 9] - s[:, 0], axis=1), 1.0, atol=1e-5)
    # invariant to global translation/scale
    p2 = p * 3.7 + 11.0
    s2 = np.asarray(L.scale_pose(jnp.asarray(p2)))
    np.testing.assert_allclose(s, s2, atol=1e-4)
