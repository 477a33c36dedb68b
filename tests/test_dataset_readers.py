"""Real dataset readers against synthesized on-disk fixtures.

The reference ships no fixtures (SURVEY.md §4); these tests create miniature
datasets in the exact on-disk formats the readers expect (RHD pickles,
FreiHand json triplets, the MHP directory tree with Rodrigues calibration
pickles) and exercise the full read->crop->transform->target path.
"""

import json
import os
import pickle

import cv2
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.data.transforms import HandTransforms


def _img(path, size=64, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)


def _cfg(tmp, hm=16, img=64):
    cfg = load_config(freeze=False)
    cfg.DATA_DIR = str(tmp)
    cfg.MODEL.IMAGE_SIZE = [img, img]
    cfg.MODEL.HEATMAP_SIZE = [hm, hm]
    cfg.DATASET.NUM_VIEWS = 2
    return cfg.freeze()


# ------------------------------------------------------------------- RHD
def test_rhd_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.rhd import RHDDatasetKeypoints

    root = tmp_path / "RHD" / "training"
    n = 3
    anno = {}
    for i in range(n):
        _img(str(root / "color" / f"{i:05d}.png"), size=64, seed=i)
        uv = np.zeros((42, 3), np.float32)
        # left hand (0:21) visible around (20..44), right hand hidden
        uv[0:21, 0] = rng.uniform(20, 44, 21)
        uv[0:21, 1] = rng.uniform(20, 44, 21)
        uv[0:21, 2] = 1.0
        anno[i] = {"uv_vis": uv}
    with open(root / "anno_training.pickle", "wb") as f:
        pickle.dump(anno, f)

    cfg = _cfg(tmp_path)
    ds = RHDDatasetKeypoints(cfg, "training",
                             transforms=HandTransforms(64, [16]))
    assert len(ds) == n
    s = ds[0]
    assert s["imgs"].shape == (64, 64, 3)
    assert s["pose2d"].shape == (21, 2)
    assert s["heatmaps"].shape == (16, 16, 21)
    assert float(s["crop_size"]) <= 64
    # every visible joint's heatmap peaks near its coordinate
    for k in range(21):
        u, v = s["pose2d"][k]
        if 0 <= u < 16 and 0 <= v < 16:
            peak = np.unravel_index(s["heatmaps"][:, :, k].argmax(), (16, 16))
            assert abs(peak[1] - u) <= 1 and abs(peak[0] - v) <= 1


# -------------------------------------------------------------- FreiHand
def test_freihand_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data import freihand

    root = tmp_path / "FreiHand"
    k_list, mano_list, xyz_list = [], [], []
    n = 4
    for i in range(n):
        _img(str(root / "training" / "rgb" / f"{i:08d}.jpg"), size=64, seed=i)
        K = [[80.0, 0.0, 32.0], [0.0, 80.0, 32.0], [0.0, 0.0, 1.0]]
        xyz = (rng.uniform(-0.04, 0.04, size=(21, 3)) + [0, 0, 0.4]).tolist()
        k_list.append(K)
        mano_list.append([0.0] * 10)
        xyz_list.append(xyz)
    for name, data in [("K", k_list), ("mano", mano_list), ("xyz", xyz_list)]:
        with open(root / f"training_{name}.json", "w") as f:
            json.dump(data, f)

    # patch the split constant so our 4-sample fixture covers train+val
    old = freihand.N_UNIQUE
    freihand.N_UNIQUE = n
    try:
        cfg = _cfg(tmp_path)
        ds = freihand.FreiHandDatasetKeypoints(
            cfg, "training", transforms=HandTransforms(64, [16]))
        assert len(ds) == int(n * 0.8)
        s = ds[0]
        assert s["imgs"].shape == (64, 64, 3)
        assert s["pose3d"].shape == (21, 3)
        # projection consistency: uv = K xyz / z, scaled by hm/img
        K = np.asarray(k_list[0])
        xyz = np.asarray(xyz_list[0])
        uv = (K @ xyz.T).T
        uv = uv[:, :2] / uv[:, 2:]
        np.testing.assert_allclose(s["pose2d"], uv * 16 / 64, atol=1e-3)
    finally:
        freihand.N_UNIQUE = old


# ------------------------------------------------------------------- MHP
def _mhp_fixture(tmp_path, rng, n_frames=2):
    root = tmp_path / "MHP"
    sub = "data_17"  # eval split
    for f in range(n_frames):
        for cam in range(1, 5):
            _img(str(root / "annotated_frames" / sub / f"{f}_webcam_{cam}.jpg"),
                 size=64, seed=f * 4 + cam)
    for cam in range(1, 5):
        calib = root / "calibrations" / sub / f"webcam_{cam}"
        os.makedirs(calib, exist_ok=True)
        rvec = np.asarray([0.0, 0.1 * cam, 0.0])
        tvec = np.asarray([0.0, 0.0, 400.0])
        with open(calib / "rvec.pkl", "wb") as fh:
            pickle.dump(rvec, fh)
        with open(calib / "tvec.pkl", "wb") as fh:
            pickle.dump(tvec, fh)
    os.makedirs(root / "annotations" / sub, exist_ok=True)
    for f in range(n_frames):
        pts = rng.uniform(-30, 30, size=(21, 3))
        with open(root / "annotations" / sub / f"{f}_joints.txt", "w") as fh:
            for j, p in enumerate(pts):
                fh.write(f"{j} {p[0]} {p[1]} {p[2]}\n")


def test_mhp_multiview_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.mhp import (
        INTRINSICS, MHPMultiViewDataset)

    n_frames = 2
    _mhp_fixture(tmp_path, rng, n_frames)
    cfg = _cfg(tmp_path)
    ds = MHPMultiViewDataset(cfg, "evaluation",
                             transform=HandTransforms(64, [16]))
    assert len(ds) == n_frames
    s = ds[0]
    assert s["imgs"].shape == (2, 64, 64, 3)       # NUM_VIEWS=2
    assert s["extrinsic_matrices"].shape == (2, 3, 4)
    assert s["pose3d"].shape == (21, 3)
    np.testing.assert_allclose(s["intrinsic_matrix"], INTRINSICS)
    # projection consistency per view (modulo the 16/64 rescale)
    for v in range(2):
        ext = s["extrinsic_matrices"][v]
        cam_pts = ext[:, :3] @ s["pose3d"].T + ext[:, 3:]
        uvw = INTRINSICS @ cam_pts
        uv = (uvw[:2] / uvw[2:]).T * (16 / 64)
        np.testing.assert_allclose(s["pose2d"][v], uv, atol=1e-3)
    # deterministic occlusion: same index -> identical sample
    s2 = ds[0]
    np.testing.assert_allclose(s["imgs"], s2["imgs"])


def test_mhp_cpm_reader(tmp_path, rng):
    """CPM variant: 22-channel background targets, centre map, (x-128)/256
    normalisation (reference MHP_CPMDataset.py:100-240)."""
    from hrnet_hand_pose_estimation_tpu.data.mhp import MHPCPMDataset

    _mhp_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    ds = MHPCPMDataset(cfg, "evaluation")
    s = ds[0]
    assert s["imgs"].shape == (64, 64, 3)
    assert s["heatmaps"].shape == (16, 16, 22)
    assert s["centermaps"].shape == (64, 64, 1)
    # background channel complements the joint max
    np.testing.assert_allclose(
        s["heatmaps"][..., 0], 1.0 - s["heatmaps"][..., 1:].max(-1), atol=1e-6)
    # CPM normalisation: a 0..255 image lands in [-0.5, 0.5]
    assert -0.51 <= s["imgs"].min() and s["imgs"].max() <= 0.5
    # centre map: clipped unwindowed Gaussian (zeros far away, peak ~1)
    cm = s["centermaps"][..., 0]
    assert cm.max() <= 1.0 and (cm < 0.0099).sum() > cm.size // 2
    # pose2d is in heatmap pixels
    assert s["pose2d"].shape == (21, 2)


def test_mhp_cpm_multiview_reader(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.mhp import MHPCPMMultiViewDataset

    _mhp_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    ds = MHPCPMMultiViewDataset(cfg, "evaluation")
    s = ds[0]
    v = cfg.DATASET.NUM_VIEWS
    assert s["imgs"].shape == (v, 64, 64, 3)        # cfg IMAGE_SIZE
    assert s["heatmaps"].shape == (v, 16, 16, 22)
    assert s["centermaps"].shape == (v, 64, 64, 1)
    assert s["extrinsic_matrices"].shape == (v, 3, 4)


# ------------------------------------------------------------------ MPII
def test_mpii_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.coco_mpii import MPIIDataset

    root = tmp_path
    _img(str(root / "images" / "im0.jpg"), size=96, seed=0)
    anns = [{
        "image": "im0.jpg",
        "joints": rng.uniform(20, 70, size=(16, 2)).tolist(),
        "joints_vis": [1] * 16,
        "center": [48.0, 48.0],
        "scale": 0.4,   # 80 px box
    }]
    os.makedirs(root / "annot", exist_ok=True)
    with open(root / "annot" / "valid.json", "w") as f:
        json.dump(anns, f)

    ds = MPIIDataset(str(root), "valid", HandTransforms(64, [16]), 16, 2.0)
    s = ds[0]
    assert s["imgs"].shape == (64, 64, 3)
    assert s["pose2d"].shape == (16, 2)
    assert s["heatmaps"].shape == (16, 16, 16)


# ------------------------------------------------------------------- FHA
def test_fha_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.fha import (
        CAM_EXTR, CAM_INTR, FHADataset, project_fha)

    rel = os.path.join("Subject_5", "pour", "1")
    color_dir = tmp_path / "FHA" / "Videos" / rel / "color"
    skel_dir = tmp_path / "FHA" / "Hand_pose_annotation_v1" / rel
    os.makedirs(skel_dir, exist_ok=True)
    n = 2
    skels = rng.uniform(-60, 60, size=(n, 21, 3)) + [0, 0, 500]
    with open(skel_dir / "skeleton.txt", "w") as f:
        for i in range(n):
            f.write(" ".join([str(i)] + [f"{v}" for v in skels[i].reshape(-1)]) + "\n")
    for i in range(n):
        _img(str(color_dir / f"color_{i:04d}.jpeg"), size=64, seed=i)

    ds = FHADataset(str(tmp_path), "evaluation")
    assert len(ds) == n
    s = ds[0]
    np.testing.assert_allclose(s["pose3d"], skels[0], rtol=1e-5)
    np.testing.assert_allclose(s["pose2d"], project_fha(skels[0]), atol=1e-3)


# ------------------------------------------------------------------- STB
def test_stb_reader_roundtrip(tmp_path, rng):
    scipy_io = pytest.importorskip("scipy.io")
    from hrnet_hand_pose_estimation_tpu.data.stb import (
        STBDataset, depth_to_color, palm_to_wrist)

    seq = "B1Counting"
    img_dir = tmp_path / "STB" / "evaluation" / "images" / seq
    lbl_dir = tmp_path / "STB" / "evaluation" / "labels"
    os.makedirs(lbl_dir, exist_ok=True)
    n = 2
    # handPara stored (3, 21, N), depth frame, STB joint order
    pose = rng.uniform(-50, 50, size=(3, 21, n)) + np.array([[0], [0], [400]])[:, None]
    scipy_io.savemat(str(lbl_dir / f"{seq}_SK.mat"), {"handPara": pose})
    for i in range(n):
        _img(str(img_dir / f"SK_color_{i}.png"), size=64, seed=i)

    ds = STBDataset(str(tmp_path), "evaluation")
    assert len(ds) == n
    s = ds[0]
    assert s["pose3d"].shape == (21, 3)
    # 2D is the pinhole projection of the stored 3D through the SK colour K
    uvw = (ds.K @ s["pose3d"].T).T
    np.testing.assert_allclose(s["pose2d"], uvw[:, :2] / uvw[:, 2:3], atol=1e-3)


# -------------------------------------------------------------- HandGraph
def test_handgraph_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.handgraph import HandGraphDataset

    root = tmp_path / "HandGraph"
    labels = root / "3D_labels"
    os.makedirs(labels, exist_ok=True)
    n_poses, n_cams = 2, 2
    # camPosition.txt: one row of 7 floats per (pose, cam): [f, tx, ty, tz, quat...]
    cams = np.zeros((n_poses * n_cams, 7))
    cams[:, 0] = 180.0                      # focal
    cams[:, 4] = 1.0                        # identity quaternion (w=1)
    np.savetxt(labels / "camPosition.txt", cams)
    gestures = rng.uniform(-40, 40, size=(n_poses, 21, 3)) + [0, 0, 600]
    np.savetxt(labels / "handGestures.txt", gestures.reshape(n_poses, -1))
    with open(labels / "val-camera.txt", "w") as f:
        f.write("cam1\n")
    for p in range(n_poses):
        for c in range(n_cams):
            _img(str(root / "images" / f"pose{p}_cam{c}.png"), size=64, seed=p * 2 + c)

    train = HandGraphDataset(str(tmp_path), "training")
    val = HandGraphDataset(str(tmp_path), "evaluation")
    assert len(train) + len(val) == n_poses * n_cams
    assert len(val) == n_poses            # the cam1 images
    s = train[0]
    assert s["pose2d"].shape == (21, 2)
    assert s["pose3d"].shape == (21, 3)
    assert np.isfinite(s["pose2d"]).all()
