"""Geometry tests: DLT family, RANSAC, unprojection, 3D soft-argmax.

Mirrors the reference's own triangulation sanity harness (tools/DLT.py:123-146:
project known 3D points through calibrated cameras, recover them, compare)
plus grid_sample parity for the volumetric path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops import geometry as G
from hrnet_hand_pose_estimation_tpu.ops import volumetric as V


def _synthetic_cameras(n_views=4, seed=0):
    """Calibrated ring of cameras looking at the origin (MHP-like K)."""
    rng = np.random.default_rng(seed)
    fx, fy, cx, cy = 614.878, 615.479, 313.219, 231.288  # MHPMultiViewDataset.py:78-88
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    projs = []
    for i in range(n_views):
        angle = 2 * np.pi * i / n_views + rng.uniform(-0.1, 0.1)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([[0.0], [0.0], [600.0]], np.float32)  # camera 600mm out
        projs.append(K @ np.concatenate([R, t], axis=1))
    return np.stack(projs)  # (V, 3, 4)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(1)
    projs = _synthetic_cameras()
    pts3d = rng.uniform(-80, 80, size=(2, 21, 3)).astype(np.float32)  # mm
    # project
    hom = np.concatenate([pts3d, np.ones_like(pts3d[..., :1])], -1)   # (B,K,4)
    img = np.einsum("vij,bkj->bvki", projs, hom)
    pts2d = img[..., :2] / img[..., 2:3]
    return projs, pts3d, pts2d


def test_project_points(scene):
    projs, pts3d, pts2d = scene
    b, v, k = pts3d.shape[0], projs.shape[0], pts3d.shape[1]
    pr = jnp.broadcast_to(jnp.asarray(projs)[None], (b, v, 3, 4))
    pt = jnp.broadcast_to(jnp.asarray(pts3d)[:, None], (b, v, k, 3))
    got = np.asarray(G.project_points(pr, pt))  # (B, V, K, 2)
    np.testing.assert_allclose(got, pts2d, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("method", ["eigh", "svd", "sii"])
def test_triangulate_recovers_3d(scene, method):
    projs, pts3d, pts2d = scene
    b, v, k = pts2d.shape[0], 4, 21
    pts2d_bvk = np.swapaxes(pts2d, 1, 2) if pts2d.shape[1] == 4 else pts2d
    # scene gives (B, V, K, 2) already
    rec = np.asarray(G.triangulate_batch(
        jnp.asarray(pts2d), jnp.broadcast_to(jnp.asarray(projs)[None], (b, v, 3, 4)),
        method=method))
    tol = 5.0 if method == "sii" else 0.5  # sii: 2 fixed iterations, like reference
    assert np.abs(rec - pts3d).max() < tol, f"{method}: {np.abs(rec - pts3d).max()}"


def test_triangulate_weighted_downweights_bad_view(scene):
    projs, pts3d, pts2d = scene
    b = pts3d.shape[0]
    noisy = pts2d.copy()
    noisy[:, 0] += 250.0  # corrupt view 0
    w = np.ones((b, 4, 21), np.float32)
    w[:, 0] = 1e-4
    rec = np.asarray(G.triangulate_batch(
        jnp.asarray(noisy), jnp.broadcast_to(jnp.asarray(projs)[None], (b, 4, 3, 4)),
        method="eigh", confidences=jnp.asarray(w)))
    assert np.abs(rec - pts3d).max() < 2.0


def test_ransac_rejects_outlier_view(scene):
    projs, pts3d, pts2d = scene
    b = pts3d.shape[0]
    noisy = pts2d.copy()
    noisy[:, 1] += 300.0  # corrupt view 1 badly
    rec = np.asarray(G.triangulate_batch(
        jnp.asarray(noisy), jnp.broadcast_to(jnp.asarray(projs)[None], (b, 4, 3, 4)),
        method="ransac"))
    assert np.abs(rec - pts3d).max() < 2.0


def test_update_after_resize():
    K = jnp.asarray([[600.0, 0, 320], [0, 610.0, 240], [0, 0, 1]])
    K2 = np.asarray(G.update_after_resize(K, (480, 640), (64, 64)))
    np.testing.assert_allclose(K2[0, 0], 600 * 64 / 640, rtol=1e-6)
    np.testing.assert_allclose(K2[1, 1], 610 * 64 / 480, rtol=1e-6)
    np.testing.assert_allclose(K2[0, 2], 320 * 64 / 640, rtol=1e-6)
    assert K2[2, 2] == 1.0


def test_homogeneous_roundtrip(rng):
    pts = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    back = G.homogeneous_to_euclidean(G.euclidean_to_homogeneous(pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-6)


# ------------------------------------------------------------- volumetric
def test_coord_volume_centred():
    base = jnp.asarray([[10.0, 20.0, 30.0]])
    cv = np.asarray(V.build_coord_volume(base, 100.0, 8))
    assert cv.shape == (1, 8, 8, 8, 3)
    np.testing.assert_allclose(cv[0, 0, 0, 0], [10 - 50, 20 - 50, 30 - 50])
    np.testing.assert_allclose(cv[0, -1, -1, -1], [10 + 50, 20 + 50, 30 + 50])


def test_rotate_coord_volume_preserves_center():
    base = jnp.asarray([[5.0, 5.0, 5.0]])
    cv = V.build_coord_volume(base, 10.0, 4)
    theta = jnp.asarray([0.7])
    rot = V.rotate_coord_volume(cv, theta, (0, 1, 0), center=base)
    # distances from the centre are preserved
    d0 = np.linalg.norm(np.asarray(cv) - np.asarray(base)[:, None, None, None], axis=-1)
    d1 = np.linalg.norm(np.asarray(rot) - np.asarray(base)[:, None, None, None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-4)
    # zero rotation is identity
    rot0 = V.rotate_coord_volume(cv, jnp.asarray([0.0]), (0, 1, 0), center=base)
    np.testing.assert_allclose(np.asarray(rot0), np.asarray(cv), atol=1e-5)


def test_bilinear_sample_matches_grid_sample(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, h, w, c = 2, 16, 16, 5
    imgs = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # pixel coords incl. out-of-range to exercise zero padding
    coords = rng.uniform(-3, 19, size=(b, 40, 2)).astype(np.float32)

    got = np.asarray(V.bilinear_sample_nhwc(jnp.asarray(imgs), jnp.asarray(coords)))

    timg = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    # convert pixel coords to align_corners=True normalised coords
    tnorm = coords.copy()
    tnorm[..., 0] = coords[..., 0] / (w - 1) * 2 - 1
    tnorm[..., 1] = coords[..., 1] / (h - 1) * 2 - 1
    tgrid = torch.from_numpy(tnorm).unsqueeze(2)  # (B, N, 1, 2)
    want = F.grid_sample(timg, tgrid, align_corners=True, padding_mode="zeros")
    want = want.squeeze(-1).permute(0, 2, 1).numpy()  # (B, N, C)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unproject_heatmaps_matches_reference_loop(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, v, hw, c, s = 2, 3, 8, 4, 6
    feats = rng.normal(size=(b, v, hw, hw, c)).astype(np.float32)
    projs = np.stack([_synthetic_cameras(v, seed=i) for i in range(b)])
    # shrink intrinsics to heatmap scale so projections land near the map
    scale = np.diag([hw / 640.0, hw / 480.0, 1.0]).astype(np.float32)
    projs = np.einsum("ij,bvjk->bvik", scale, projs)
    cv = np.asarray(V.build_coord_volume(jnp.zeros((b, 3)), 200.0, s))

    got = np.asarray(V.unproject_heatmaps(
        jnp.asarray(feats), jnp.asarray(projs), jnp.asarray(cv), "sum"))

    # reference-style loop (op.py:99-168) in torch
    want = np.zeros((b, s, s, s, c), np.float32)
    for bi in range(b):
        grid = cv[bi].reshape(-1, 3)
        acc = np.zeros((v, s * s * s, c), np.float32)
        for vi in range(v):
            hom = np.concatenate([grid, np.ones((grid.shape[0], 1))], 1)
            uvw = (projs[bi, vi] @ hom.T).T
            invalid = uvw[:, 2] <= 0
            uvw[uvw[:, 2] == 0, 2] = 1.0
            uv = uvw[:, :2] / uvw[:, 2:3]
            gn = np.zeros_like(uv)
            gn[:, 0] = 2 * (uv[:, 0] / hw - 0.5)
            gn[:, 1] = 2 * (uv[:, 1] / hw - 0.5)
            timg = torch.from_numpy(feats[bi, vi].transpose(2, 0, 1)[None])
            tgrid = torch.from_numpy(gn.astype(np.float32))[None, :, None, :]
            sam = F.grid_sample(timg, tgrid, align_corners=True, padding_mode="zeros")
            sam = sam[0, :, :, 0].T.numpy()  # (N, C)
            sam[invalid] = 0.0
            acc[vi] = sam
        want[bi] = acc.sum(0).reshape(s, s, s, c)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_integrate_volumes_recovers_peak_voxel():
    b, s, k = 1, 8, 2
    cv = V.build_coord_volume(jnp.zeros((b, 3)), 100.0, s)
    vols = np.zeros((b, s, s, s, k), np.float32)
    vols[0, 2, 3, 4, 0] = 50.0  # sharp peak -> softmax ~ delta
    vols[0, 5, 1, 6, 1] = 50.0
    coords, probs = V.integrate_volumes_with_coordinates(jnp.asarray(vols), cv)
    cvn = np.asarray(cv)
    np.testing.assert_allclose(np.asarray(coords)[0, 0], cvn[0, 2, 3, 4], atol=0.5)
    np.testing.assert_allclose(np.asarray(coords)[0, 1], cvn[0, 5, 1, 6], atol=0.5)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=(1, 2, 3)), 1.0, atol=1e-5)
