"""Triangulation nets + V2V: shapes, gradients, end-to-end recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
from hrnet_hand_pose_estimation_tpu.models.triangulation import (
    AlgebraicTriangulationNet,
    Discriminator,
    RANSACTriangulationNet,
    VolumetricTriangulationNet,
    build_triangulation_net,
)
from hrnet_hand_pose_estimation_tpu.models.v2v import V2VModel


@pytest.fixture(scope="module")
def cfg3d(tiny_cfg):
    cfg = tiny_cfg.clone().defrost()
    cfg.MODEL.VOLUME_SIZE = 32          # divisible by 2^5 for V2V
    cfg.MODEL.CUBOID_SIZE = 400.0
    cfg.MODEL.VOL_CONFIDENCES = False
    cfg.MODEL.ALG_CONFIDENCES = False
    cfg.MODEL.TRIANGULATION_MODEL_NAME = "alg"
    return cfg.freeze()


def _proj_matrices(b, v=2, hm=16):
    """Heatmap-scale projections of a synthetic camera ring.

    Principal point sits at (hm-1)/2 — exactly where a uniform (random-init)
    softmax model decodes — so the triangulated base point of an untrained
    model lands near the origin instead of a degenerate far intersection.
    """
    fx = fy = 30.0
    cx = cy = (hm - 1) / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    projs = []
    for i in range(v):
        ang = 2 * np.pi * i / v + 0.3
        c, s = np.cos(ang), np.sin(ang)
        Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        # tilt each camera differently about x so identical per-view decodes
        # still give independent DLT rows (otherwise the y-equations of an
        # untilted ring coincide and the nullspace degenerates to a line)
        tx = 0.2 + 0.15 * i
        ct, st = np.cos(tx), np.sin(tx)
        Rx = np.array([[1, 0, 0], [0, ct, -st], [0, st, ct]], np.float32)
        R = Rx @ Ry
        t = np.array([[0], [0], [900.0]], np.float32)
        projs.append(K @ np.concatenate([R, t], 1))
    return jnp.broadcast_to(jnp.asarray(np.stack(projs)), (b, v, 3, 4))


@pytest.mark.slow
def test_v2v_shapes():
    model = V2VModel(out_channels=21, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 32, 32))
    variables = model.init(jax.random.key(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 32, 32, 32, 21)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n == 11_944_485  # == reference V2VModel(32, 21) parameter count


def test_alg_net_forward(cfg3d):
    model = build_triangulation_net(cfg3d, "alg")
    imgs = jnp.zeros((2, 2, 64, 64, 3))
    projs = _proj_matrices(2, 2)
    variables = model.init(jax.random.key(0), imgs, projs, False)
    out = model.apply(variables, imgs, projs, False)
    assert out.keypoints_3d.shape == (2, 21, 3)
    assert out.keypoints_2d.shape == (2, 2, 21, 2)
    assert out.heatmaps.shape == (2, 2, 16, 16, 21)


def test_ransac_net_forward(cfg3d):
    model = build_triangulation_net(cfg3d, "ransac")
    imgs = jnp.zeros((1, 3, 64, 64, 3))
    projs = _proj_matrices(1, 3)
    variables = model.init(jax.random.key(0), imgs, projs, False)
    out = model.apply(variables, imgs, projs, False)
    assert out.keypoints_3d.shape == (1, 21, 3)


@pytest.mark.slow
def test_vol_net_forward_and_grad(cfg3d):
    model = build_triangulation_net(cfg3d, "vol")
    imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    projs = _proj_matrices(1, 2)
    variables = model.init(
        {"params": jax.random.key(0), "aug": jax.random.key(1)}, imgs, projs, False)
    out = model.apply(variables, imgs, projs, False)
    assert out.keypoints_3d.shape == (1, 21, 3)
    assert out.volumes.shape == (1, 32, 32, 32, 21)
    assert out.coord_volumes.shape == (1, 32, 32, 32, 3)
    # probability volumes normalised
    np.testing.assert_allclose(
        np.asarray(out.volumes).sum(axis=(1, 2, 3)), 1.0, atol=1e-4)
    # keypoints inside the cuboid around the base point
    base = np.asarray(out.base_points)[0]
    assert np.abs(base).max() < 50.0  # converging rays -> near origin
    assert np.all(np.abs(np.asarray(out.keypoints_3d)[0] - base) <= 401.0)

    # gradients flow to the volume net and process_features
    def loss(params):
        o = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                        imgs, projs, True, rngs={"aug": jax.random.key(2)},
                        mutable=["batch_stats"])[0]
        return jnp.sum(o.keypoints_3d ** 2) * 1e-6

    grads = jax.grad(loss)(variables["params"])
    g_vol = jax.tree.leaves(grads["volume_net"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_vol)


def test_vol_net_train_rotation_changes_volume(cfg3d):
    model = build_triangulation_net(cfg3d, "vol")
    imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    projs = _proj_matrices(1, 2)
    variables = model.init(
        {"params": jax.random.key(0), "aug": jax.random.key(1)}, imgs, projs, False)
    o1, _ = model.apply(variables, imgs, projs, True, rngs={"aug": jax.random.key(7)},
                        mutable=["batch_stats"])
    o2, _ = model.apply(variables, imgs, projs, True, rngs={"aug": jax.random.key(8)},
                        mutable=["batch_stats"])
    # compare cube offsets (absolute coords can be huge for a random model,
    # where rtol would swallow the rotation)
    off1 = np.asarray(o1.coord_volumes) - np.asarray(o1.base_points)[:, None, None, None]
    off2 = np.asarray(o2.coord_volumes) - np.asarray(o2.base_points)[:, None, None, None]
    assert np.abs(off1 - off2).max() > 1.0


def test_discriminator():
    d = Discriminator()
    x = jnp.zeros((4, 21 * 3 + 20 * 20))
    variables = d.init(jax.random.key(0), x)
    out = d.apply(variables, x)
    assert out.shape == (4, 1)
