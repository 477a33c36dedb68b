"""Long-tail public-API coverage: functions shipped as part of the
documented surface but previously exercised by no test (scale-aware
targets, SVD DLT, reprojection errors, bilinear resize, config-from-dict,
precision cast, the layer1 param-packing API)."""

import jax
import jax.numpy as jnp
import numpy as np


def _ref_scale_aware(joints, vis, sigmas, res):
    """Transliteration of the reference ScaleAwareHeatmapGenerator
    (target_generators.py:56-92) with per-joint sigma, max-combine skipped
    (one person), channel-last output."""
    k = joints.shape[0]
    hms = np.zeros((res, res, k), np.float32)
    for idx in range(k):
        if vis[idx] <= 0:
            continue
        x, y = int(joints[idx, 0]), int(joints[idx, 1])
        if x < 0 or y < 0 or x >= res or y >= res:
            continue
        sigma = float(sigmas[idx])
        size = int(6 * sigma + 3)
        g = np.exp(-((np.arange(size) - (3 * sigma + 1)) ** 2)[None, :]
                   / (2 * sigma ** 2)
                   - ((np.arange(size) - (3 * sigma + 1)) ** 2)[:, None]
                   / (2 * sigma ** 2))
        ul = int(np.round(x - 3 * sigma - 1)), int(np.round(y - 3 * sigma - 1))
        br = int(np.round(x + 3 * sigma + 2)), int(np.round(y + 3 * sigma + 2))
        c, d = max(0, -ul[0]), min(br[0], res) - ul[0]
        a, b = max(0, -ul[1]), min(br[1], res) - ul[1]
        cc, dd = max(0, ul[0]), min(br[0], res)
        aa, bb = max(0, ul[1]), min(br[1], res)
        hms[aa:bb, cc:dd, idx] = np.maximum(hms[aa:bb, cc:dd, idx],
                                            g[a:b, c:d])
    return hms


def test_scale_aware_targets_match_reference(rng):
    from hrnet_hand_pose_estimation_tpu.ops.targets import (
        scale_aware_gaussian_targets)

    res, k = 24, 6
    joints = rng.uniform(-2, res + 1, size=(2, k, 2)).astype(np.float32)
    vis = (rng.uniform(size=(2, k)) > 0.2).astype(np.float32)
    sigmas = np.asarray([[1.0, 2.0, 1.0, 2.0, 1.0, 2.0]] * 2, np.float32)
    got = np.asarray(scale_aware_gaussian_targets(
        jnp.asarray(joints), jnp.asarray(vis), jnp.asarray(sigmas), res))
    for b in range(2):
        want = _ref_scale_aware(joints[b], vis[b], sigmas[b], res)
        np.testing.assert_allclose(got[b], want, atol=1e-5)
    assert got.max() > 0.99  # at least one joint stamped


def test_triangulate_svd_and_reprojection_errors(rng):
    from hrnet_hand_pose_estimation_tpu.ops.geometry import (
        reprojection_errors, triangulate_sii, triangulate_svd)

    # synthetic 4-view rig looking at points near the origin from z=-600
    pts3d = rng.uniform(-40, 40, size=(5, 3)).astype(np.float32)
    pts3d[:, 2] += 600.0
    K = np.array([[300.0, 0, 32], [0, 300.0, 32], [0, 0, 1]], np.float32)
    projs = []
    for vx in (-80.0, -30.0, 30.0, 80.0):
        E = np.eye(3, 4, dtype=np.float32)
        E[0, 3] = vx
        projs.append(K @ E)
    projs = np.stack(projs)                      # (V, 3, 4)
    hom = np.concatenate([pts3d, np.ones((5, 1), np.float32)], -1)
    img = np.einsum("vij,nj->nvi", projs, hom)
    pts2d = img[..., :2] / img[..., 2:]          # (N, V, 2)

    got = np.asarray(triangulate_svd(jnp.asarray(pts2d),
                                     jnp.asarray(np.tile(projs, (5, 1, 1, 1)))))
    np.testing.assert_allclose(got, pts3d, atol=1e-2)
    # agrees with the shipped SII solver
    sii = np.asarray(triangulate_sii(jnp.asarray(pts2d),
                                     jnp.asarray(np.tile(projs, (5, 1, 1, 1)))))
    np.testing.assert_allclose(got, sii, atol=1e-2)

    err = np.asarray(reprojection_errors(
        jnp.asarray(pts3d), jnp.asarray(pts2d),
        jnp.asarray(np.tile(projs, (5, 1, 1, 1)))))
    assert err.shape == (5, 4)
    assert err.max() < 1e-2                      # exact projections
    err_off = np.asarray(reprojection_errors(
        jnp.asarray(pts3d), jnp.asarray(pts2d + np.asarray([3.0, 4.0])),
        jnp.asarray(np.tile(projs, (5, 1, 1, 1)))))
    np.testing.assert_allclose(err_off, 5.0, atol=1e-2)  # 3-4-5 offset


def test_resize_bilinear_matches_cv2(rng):
    import cv2

    from hrnet_hand_pose_estimation_tpu.ops.image import resize_bilinear

    img = rng.uniform(0, 1, size=(2, 24, 16, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), (48, 32)))
    for b in range(2):
        want = cv2.resize(img[b], (32, 48), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got[b], want, atol=2e-3)


def test_config_from_dict_tuple_normalisation():
    from hrnet_hand_pose_estimation_tpu.config import config_from_dict

    cfg = config_from_dict({"GPUS": "(4,5)", "MODEL": {"NUM_JOINTS": 17}})
    assert list(cfg.GPUS) == [4, 5]
    assert cfg.MODEL.NUM_JOINTS == 17
    # frozen by default
    import pytest

    with pytest.raises(Exception):
        cfg.MODEL.NUM_JOINTS = 21


def test_cast_to_compute_floats_only():
    from hrnet_hand_pose_estimation_tpu.parallel.precision import (
        cast_to_compute)

    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "step": jnp.zeros((), jnp.int32)}
    out = cast_to_compute(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32


def test_extract_layer1_params_matches_inline_folding(tiny_cfg, rng):
    """The public packing API (fold_batchnorm + extract_layer1_params)
    produces the exact flat layout the shipped _pallas_layer1_apply folds
    inline — same values, same flags."""
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.layers import BN_EPS
    from hrnet_hand_pose_estimation_tpu.ops.pallas.fused_bottleneck import (
        extract_layer1_params)
    from hrnet_hand_pose_estimation_tpu.utils.fold_bn import fold_batchnorm

    model = hrnet_from_cfg(tiny_cfg, head="softmax")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), x, False)
    v = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32))
        if a.ndim > 1 else a, v)

    flat, flags = extract_layer1_params(fold_batchnorm(v))
    assert flags == (True, False, False, False)

    # inline folding exactly as models/hrnet._pallas_layer1_apply does
    params = v["params"]["backbone"]["layer1"]
    stats = v["batch_stats"]["backbone"]["layer1"]

    def folded(cb_p, cb_s):
        inv = cb_p["bn"]["scale"] / jnp.sqrt(cb_s["bn"]["var"] + BN_EPS)
        return cb_p["conv"]["kernel"] * inv, \
            cb_p["bn"]["bias"] - cb_s["bn"]["mean"] * inv

    want = []
    for bidx in range(4):
        blk_p, blk_s = params[f"block{bidx}"], stats[f"block{bidx}"]
        k1, b1 = folded(blk_p["cb1"], blk_s["cb1"])
        k2, b2 = folded(blk_p["cb2"], blk_s["cb2"])
        k3, b3 = folded(blk_p["cb3"], blk_s["cb3"])
        want += [k1[0, 0], b1, k2, b2, k3[0, 0], b3]
        if "downsample" in blk_p:
            ks, bs = folded(blk_p["downsample"], blk_s["downsample"])
            want += [ks[0, 0], bs]
    assert len(flat) == len(want)
    for got_leaf, want_leaf in zip(flat, want):
        # same fold math in f32, then the same dtype cast -> bit equal
        np.testing.assert_array_equal(
            np.asarray(got_leaf, np.float32),
            np.asarray(want_leaf.astype(got_leaf.dtype), np.float32))
