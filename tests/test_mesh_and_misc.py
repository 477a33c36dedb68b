"""Graph utils, mesh net, FreiHand evaluate json, quarter-offset decode."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.decode import (
    get_max_preds_with_maxvals,
    hard_argmax,
    quarter_offset_refine,
)
from hrnet_hand_pose_estimation_tpu.utils.graph import (
    adjacency_from_edges,
    chebyshev_basis,
    coarsen_levels,
    greedy_coarsen,
    normalized_laplacian,
    rescaled_laplacian,
)


def test_laplacian_properties():
    adj = adjacency_from_edges(5, np.array([[0, 1], [1, 2], [2, 3], [3, 4]]))
    lap = normalized_laplacian(adj)
    evals = np.linalg.eigvalsh(lap)
    assert evals.min() >= -1e-6
    assert evals.max() <= 2.0 + 1e-6
    # constant-ish vector in near-nullspace: L D^{1/2} 1 = 0
    d = adj.sum(1)
    v = np.sqrt(d)
    np.testing.assert_allclose(lap @ v, 0.0, atol=1e-6)


def test_coarsening_halves():
    adj = adjacency_from_edges(8, np.array([[i, i + 1] for i in range(7)]))
    coarse, cl = greedy_coarsen(adj)
    assert coarse.shape[0] == 4
    adjs, clusters = coarsen_levels(adj, 2)
    assert len(adjs) == 3 and adjs[-1].shape[0] <= 2


def test_chebyshev_basis():
    adj = adjacency_from_edges(4, np.array([[0, 1], [1, 2], [2, 3]]))
    basis = chebyshev_basis(rescaled_laplacian(adj), 3)
    assert basis.shape == (3, 4, 4)
    np.testing.assert_allclose(basis[0], np.eye(4), atol=1e-6)


def test_pool_unpool_matrices():
    from hrnet_hand_pose_estimation_tpu.utils.graph import pool_matrix, unpool_matrix

    adj = adjacency_from_edges(6, np.array([[i, i + 1] for i in range(5)]))
    _, cl = greedy_coarsen(adj)
    p = pool_matrix(cl)
    u = unpool_matrix(cl)
    assert p.shape == (cl.max() + 1, 6) and u.shape == (6, cl.max() + 1)
    np.testing.assert_allclose(p.sum(1), 1.0)          # averaging rows
    np.testing.assert_allclose(u.sum(1), 1.0)          # each child one parent
    # unpool of a constant is constant; pool(unpool(x)) == x
    x = np.arange(cl.max() + 1, dtype=np.float32)
    np.testing.assert_allclose(p @ (u @ x), x, atol=1e-6)


def test_mesh_net_shapes():
    from hrnet_hand_pose_estimation_tpu.models.mesh import build_hand_mesh_net

    net = build_hand_mesh_net()
    feats = jnp.zeros((2, 8, 8, 32))
    v = net.init(jax.random.key(0), feats, False)
    mesh, pose = net.apply(v, feats, False)
    assert mesh.shape == (2, 21, 3)


def test_mesh_net_multilevel_decoder():
    """Coarse-to-fine decoder: the lift layer operates on the coarsest graph
    and unpooling widens to the full vertex set."""
    from hrnet_hand_pose_estimation_tpu.models.mesh import build_hand_mesh_net

    net = build_hand_mesh_net(levels=2)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 32)),
                        jnp.float32)
    v = net.init(jax.random.key(0), feats, False)
    n_coarse = net.bases[-1].shape[1]
    assert n_coarse < 21
    assert v["params"]["lift"]["kernel"].shape[1] == n_coarse * net.widths[0]
    mesh, pose = net.apply(v, feats, False)
    assert mesh.shape == (2, 21, 3) and pose.shape == (2, 21, 3)
    assert np.asarray(mesh).std() > 0                  # non-degenerate output
    assert pose.shape == (2, 21, 3)


def test_quarter_offset_refine():
    hm = np.zeros((1, 16, 16, 1), np.float32)
    hm[0, 8, 8, 0] = 1.0
    hm[0, 8, 9, 0] = 0.5   # right neighbour larger than left -> +0.25 in u
    hm[0, 7, 8, 0] = 0.3   # upper neighbour larger than lower -> -0.25 in v
    coords = hard_argmax(jnp.asarray(hm))
    refined = np.asarray(quarter_offset_refine(jnp.asarray(hm), coords))
    np.testing.assert_allclose(refined[0, 0], [8.25, 7.75])


def test_get_max_preds_zeroes_nonpositive():
    hm = -np.ones((1, 8, 8, 2), np.float32)
    hm[0, 3, 4, 0] = 2.0  # channel 0 positive peak; channel 1 all negative
    preds, maxvals = get_max_preds_with_maxvals(jnp.asarray(hm))
    assert np.asarray(preds)[0, 0].tolist() == [4.0, 3.0]
    assert np.asarray(preds)[0, 1].tolist() == [0.0, 0.0]


def test_freihand_evaluate_writes_json(tmp_path, monkeypatch, rng):
    from hrnet_hand_pose_estimation_tpu.data import freihand

    ds = freihand.FreiHandDataset.__new__(freihand.FreiHandDataset)
    uv = rng.uniform(0, 200, size=(21, 2)).astype(np.float32)
    monkeypatch.setattr(ds, "sample_lst", range(2), raising=False)
    monkeypatch.setattr(
        freihand.FreiHandDataset, "_load_raw",
        lambda self, i: (None, uv, None, None, None), raising=False)
    preds = np.stack([uv + 1.0, uv + 2.0])  # EPE ~ sqrt(2), 2*sqrt(2)
    out = ds.evaluate(None, preds, None, str(tmp_path))
    assert os.path.exists(out["res_file"])
    data = json.load(open(out["res_file"]))
    assert len(data) == 2 and len(data[0]["keypoints"]) == 63
    assert out["EPE_px"] == pytest.approx((np.sqrt(2) + 2 * np.sqrt(2)) / 2, rel=1e-4)


def test_lbs_hand_model():
    """LBS layer (MANO-style): rest pose identity, pivot-correct root
    rotation, joint-local isolation."""
    from hrnet_hand_pose_estimation_tpu.models.mano import lbs, toy_hand_model

    m = toy_hand_model()
    b = 2
    pose = jnp.zeros((b, 5, 3))
    betas = jnp.zeros((b, 3))
    verts, joints = lbs(m, pose, betas)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(m.v_template),
                               atol=1e-4)

    # root rotated 90deg about z: verts rotate about the ROOT JOINT pivot
    pose_rot = pose.at[:, 0, 2].set(jnp.pi / 2)
    verts2, joints2 = lbs(m, pose_rot, betas)
    j0 = np.asarray(joints)[0, 0]
    v0 = np.asarray(m.v_template) - j0
    expect = np.stack([-v0[:, 1], v0[:, 0], v0[:, 2]], -1) + j0
    np.testing.assert_allclose(np.asarray(verts2)[0], expect, atol=1e-4)

    # rotating a mid-chain joint leaves ancestor-owned vertices fixed
    pose_mid = jnp.zeros((b, 5, 3)).at[:, 2, 2].set(0.7)
    verts3, _ = lbs(m, pose_mid, betas)
    moved = np.abs(np.asarray(verts3)[0] - np.asarray(m.v_template)).max(axis=1)
    static = moved[np.asarray(m.weights)[:, :2].sum(1) > 0]
    assert static.max() < 1e-5

    # shape blendshapes move vertices
    verts4, _ = lbs(m, pose, betas.at[:, 0].set(3.0))
    assert np.abs(np.asarray(verts4) - np.asarray(verts)).max() > 1e-3
