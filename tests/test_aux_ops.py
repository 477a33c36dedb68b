"""NMS, loss scaling, device image ops, vis, cameras."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.nms import iou_matrix, nms, oks_nms, soft_nms
from hrnet_hand_pose_estimation_tpu.parallel.precision import (
    DynamicLossScaler,
    apply_updates_unless_overflow,
)


# ------------------------------------------------------------------ NMS
def _naive_nms(dets, thresh):
    """Transliteration of the reference pure-python nms (nms/nms.py:34-60)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return sorted(keep)


def test_nms_matches_reference(rng):
    n = 30
    xy = rng.uniform(0, 80, size=(n, 2))
    wh = rng.uniform(10, 40, size=(n, 2))
    dets = np.concatenate([xy, xy + wh, rng.uniform(size=(n, 1))], 1).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(dets), 0.5))
    want = _naive_nms(dets, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_iou_matrix_selfoverlap():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    m = np.asarray(iou_matrix(boxes))
    assert m[0, 1] == pytest.approx(1.0)
    assert m[0, 2] == 0.0


def test_soft_nms_decays_overlaps(rng):
    dets = np.asarray([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]],
                      np.float32)
    out = np.asarray(soft_nms(jnp.asarray(dets)))
    assert out[0, 4] == pytest.approx(0.9, abs=1e-5)      # top box untouched
    assert out[1, 4] < 0.8                                 # overlapped decayed
    assert out[2, 4] == pytest.approx(0.7, abs=1e-5)      # disjoint untouched


def test_oks_nms_suppresses_duplicates(rng):
    kp = rng.uniform(10, 50, size=(21, 2))
    a = np.concatenate([kp, np.ones((21, 1))], 1)
    b = a + np.array([0.2, 0.2, 0.0])   # near-duplicate
    c = a + np.array([40.0, 40.0, 0.0])
    kpts = jnp.asarray(np.stack([a, b, c]), jnp.float32)
    keep = np.asarray(oks_nms(kpts, jnp.asarray([0.9, 0.8, 0.7]),
                              jnp.asarray([900.0, 900.0, 900.0]), 0.9))
    assert keep.tolist() == [True, False, True]


# --------------------------------------------------------- loss scaling
def test_dynamic_loss_scaler_backoff_and_growth():
    scaler = DynamicLossScaler(init_scale=8.0, scale_window=2)
    state = scaler.init()
    grads = {"w": jnp.asarray([8.0, 16.0])}
    g, state, overflow = scaler.unscale_and_update(grads, state)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(g["w"]), [1.0, 2.0])
    # second clean step hits the window -> scale doubles
    _, state, _ = scaler.unscale_and_update(grads, state)
    assert float(state.scale) == 16.0
    # overflow halves
    bad = {"w": jnp.asarray([jnp.inf, 1.0])}
    _, state, overflow = scaler.unscale_and_update(bad, state)
    assert bool(overflow)
    assert float(state.scale) == 8.0


def test_apply_updates_skips_on_overflow():
    params = {"w": jnp.asarray([1.0])}
    updates = {"w": jnp.asarray([0.5])}
    out = apply_updates_unless_overflow(params, updates, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(out["w"]), [1.0])
    out = apply_updates_unless_overflow(params, updates, jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(out["w"]), [1.5])


# ----------------------------------------------------------- image ops
def test_affine_warp_matches_cv2(rng):
    import cv2

    from hrnet_hand_pose_estimation_tpu.data.transforms import affine_matrix
    from hrnet_hand_pose_estimation_tpu.ops.image import affine_warp

    img = rng.uniform(0, 1, size=(40, 40, 3)).astype(np.float32)
    mat = affine_matrix((20, 20), 40 / 200.0, (32, 32), rot=20.0)[:2]
    want = cv2.warpAffine(img, mat, (32, 32))
    got = np.asarray(affine_warp(jnp.asarray(img[None]),
                                 jnp.asarray(mat[None].astype(np.float32)), (32, 32)))[0]
    # interiors match; borders differ slightly (cv2 rounds differently)
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=2e-2)


def test_preprocess_for_inference():
    from hrnet_hand_pose_estimation_tpu.ops.image import preprocess_for_inference

    img = jnp.zeros((1, 100, 100, 3), jnp.uint8)
    out = preprocess_for_inference(img, 64)
    assert out.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                               (0 - np.array([0.485, 0.456, 0.406])) /
                               np.array([0.229, 0.224, 0.225]), atol=1e-5)


# -------------------------------------------------------------- cameras
def test_project_point_radial_matches_cv2(rng):
    """Radial distortion golden test vs cv2.projectPoints (the tangential
    term follows the reference's h36m-style approximation, cameras_cuda.py,
    which differs from OpenCV's full model — so p=0 here)."""
    import cv2

    from hrnet_hand_pose_estimation_tpu.ops.cameras import project_point_radial

    pts = rng.normal(size=(10, 3)).astype(np.float64) * 0.2 + [0, 0, 3.0]
    rvec = np.array([0.1, -0.2, 0.05])
    R = cv2.Rodrigues(rvec)[0]
    T_cam = np.array([0.1, -0.05, 0.2])        # x_cam = R x + T_cam
    f, c = (400.0, 420.0), (320.0, 240.0)
    k = np.array([0.1, -0.05, 0.01])
    dist = np.array([k[0], k[1], 0.0, 0.0, k[2]])
    K = np.array([[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1.0]])
    want, _ = cv2.projectPoints(pts, rvec, T_cam, K, dist)
    # ours parameterises x_cam = R (x - T)  =>  T = -R^T T_cam
    T_ours = -R.T @ T_cam
    uv, z = project_point_radial(
        jnp.asarray(pts, jnp.float32), jnp.asarray(R, jnp.float32),
        jnp.asarray(T_ours, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(c, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.zeros(2, jnp.float32))
    np.testing.assert_allclose(np.asarray(uv), want[:, 0], atol=0.05)
    assert (np.asarray(z) > 0).all()


def test_project_tangential_term_reference_formula():
    from hrnet_hand_pose_estimation_tpu.ops.cameras import project_point_radial

    pts = np.array([[0.2, -0.1, 2.0]], np.float32)
    p = np.array([0.03, -0.02], np.float32)
    uv, _ = project_point_radial(
        jnp.asarray(pts), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3),
        jnp.ones(2), jnp.zeros(2), jnp.zeros(3), jnp.asarray(p))
    x, y = 0.1, -0.05
    r2 = x * x + y * y
    tan = p[0] * y + p[1] * x
    want = np.array([x * (1 + tan) + p[1] * r2, y * (1 + tan) + p[0] * r2])
    np.testing.assert_allclose(np.asarray(uv)[0], want, atol=1e-6)


# ------------------------------------------------------------ zipreader
def test_zipreader_roundtrip(tmp_path):
    import zipfile

    import cv2

    from hrnet_hand_pose_estimation_tpu.utils.zipreader import imread, xmlread

    img = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    zpath = str(tmp_path / "data.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("imgs/a.png", png)
        z.writestr("meta/cam.xml", b"<cam f='500'/>")
    got = imread(zpath + "@imgs/a.png")
    np.testing.assert_array_equal(got, img)
    assert xmlread(zpath + "@meta/cam.xml") == b"<cam f='500'/>"
    # plain paths still go through cv2.imread / open
    plain = str(tmp_path / "b.png")
    cv2.imwrite(plain, img)
    np.testing.assert_array_equal(imread(plain), img)


# ------------------------------------------------------------------ vis
def test_vis_dumps(tmp_path, rng, tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.utils.vis import (
        save_batch_heatmaps,
        save_batch_image_with_joints,
        save_debug_images,
    )

    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    joints = rng.uniform(0, 32, size=(2, 21, 2)).astype(np.float32)
    hms = rng.uniform(size=(2, 8, 8, 21)).astype(np.float32)
    f1 = str(tmp_path / "joints.jpg")
    save_batch_image_with_joints(imgs, joints, f1)
    assert os.path.getsize(f1) > 0
    f2 = str(tmp_path / "hms.jpg")
    save_batch_heatmaps(imgs, hms, f2)
    assert os.path.getsize(f2) > 0

    cfg = tiny_cfg.clone().defrost()
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_PRED = True
    cfg.freeze()
    save_debug_images(cfg, imgs, joints, joints, hms, hms, str(tmp_path / "dbg"))
    assert (tmp_path / "dbg_gt.jpg").exists()
    assert (tmp_path / "dbg_hm_pred.jpg").exists()


def test_image_util_helpers(rng):
    from hrnet_hand_pose_estimation_tpu.utils.image_util import (
        compute_uv_from_heatmaps,
        crop_patch,
        expand_bbox,
        pad_to_square,
        square_bbox,
    )

    x0, y0, w, h = expand_bbox((10, 10, 20, 10), 1.5, 100, 100)
    assert w == 30 and h == 15 and x0 == 5

    sx, sy, side = square_bbox((10, 10, 20, 10), 64, 64)
    assert side == min(64, 40)
    assert 0 <= sx <= 64 - side and 0 <= sy <= 64 - side

    img = rng.uniform(size=(10, 20, 3)).astype(np.float32)
    padded, (px, py) = pad_to_square(img)
    assert padded.shape[:2] == (20, 20)
    np.testing.assert_allclose(padded[py:py + 10, px:px + 20], img)

    patch = crop_patch(img, 15, 5, 8)
    assert patch.shape[:2] == (8, 8)

    hms = np.zeros((1, 8, 8, 2), np.float32)
    hms[0, 3, 5, 0] = 0.7
    uvc = np.asarray(compute_uv_from_heatmaps(hms, (64, 64)))
    np.testing.assert_allclose(uvc[0, 0], [5 * 8, 3 * 8, 0.7], atol=1e-5)
