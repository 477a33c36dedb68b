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


# ------------------------------------------------------------------ COCO
def test_coco_evaluate_oks_pipeline(tmp_path, rng):
    """Full reference eval path (coco.py:288-445): rescoring, per-image
    OKS-NMS via ops/nms.py, reference-schema results json, OKS-AP."""
    from hrnet_hand_pose_estimation_tpu.data.coco_mpii import COCOKeypointsDataset

    root = tmp_path / "coco"
    images, annotations = [], []
    gt_kpts = {}
    for img_id in (1, 2):
        fname = f"{img_id:012d}.jpg"
        _img(str(root / "images" / "val2017" / fname), size=96, seed=img_id)
        images.append({"id": img_id, "file_name": fname,
                       "width": 96, "height": 96})
        kps = np.zeros((17, 3), np.float32)
        kps[:, 0] = rng.uniform(20, 70, 17)
        kps[:, 1] = rng.uniform(20, 70, 17)
        kps[:, 2] = 2
        gt_kpts[img_id] = kps
        annotations.append({
            "id": img_id * 10, "image_id": img_id, "category_id": 1,
            "num_keypoints": 17, "iscrowd": 0,
            "keypoints": kps.reshape(-1).tolist(),
            "bbox": [15.0, 15.0, 60.0, 60.0], "area": 3600.0,
        })
    os.makedirs(root / "annotations", exist_ok=True)
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    ds = COCOKeypointsDataset(str(root), "val2017")
    assert len(ds) == 2
    s = ds[0]
    assert s["pose2d"].shape == (17, 2)

    # predictions: exact GT for both images + a duplicate of image 1's
    # instance (slightly perturbed) that OKS-NMS must suppress
    preds = np.stack([
        np.concatenate([gt_kpts[1][:, :2], np.full((17, 1), 0.9)], 1),
        np.concatenate([gt_kpts[2][:, :2], np.full((17, 1), 0.9)], 1),
        np.concatenate([gt_kpts[1][:, :2] + 0.5, np.full((17, 1), 0.5)], 1),
    ])
    boxes = np.array([[45, 45, 0.3, 0.3, 3600, 1.0]] * 3, np.float32)
    name_values, ap = ds.evaluate(preds, boxes, [1, 2, 1], str(tmp_path / "out"))

    assert os.path.isfile(name_values["res_file"])
    with open(name_values["res_file"]) as f:
        results = json.load(f)
    # the duplicate was suppressed by OKS-NMS
    assert name_values["num_results"] == 2
    for r in results:
        assert set(r) == {"image_id", "category_id", "keypoints", "score",
                          "center", "scale"}       # reference writer schema
        assert len(r["keypoints"]) == 51
        # rescoring: mean joint conf (0.9) x box score (1.0)
        assert abs(r["score"] - 0.9) < 1e-6
    assert ap > 0.99                               # exact predictions


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
    from hrnet_hand_pose_estimation_tpu.data.fha import REORDER_IDX, world_to_cam
    reordered = skels[0][REORDER_IDX]
    # 3D GT comes back in CAMERA coords, reordered (FHADataset.py:150,163-165)
    np.testing.assert_allclose(s["pose3d"], world_to_cam(reordered), rtol=1e-5)
    np.testing.assert_allclose(s["pose2d"], project_fha(reordered), atol=1e-3)
    assert s["visibility"].shape == (21, 1)

    # sequence windows (FHADataset.py:149-159): N_FRAMES=2, stride=1 -> 1 window
    seq_ds = FHADataset(str(tmp_path), "evaluation", n_frames=2, stride=1)
    assert len(seq_ds) == n - 1
    w = seq_ds[0]
    assert w["imgs"].shape[0] == 2 and w["pose3d"].shape == (2, 21, 3)


def test_fha_object_utils(tmp_path, rng):
    """Object 6D-pose chain (FHA_utils.py:10-45,131-144): PLY loader, 4x4
    transposed transforms, mm scaling, extrinsic application."""
    from hrnet_hand_pose_estimation_tpu.data.fha import (
        CAM_EXTR, get_obj_transform, get_skeleton, load_objects,
        transform_obj_verts)

    obj_root = tmp_path / "Object_models"
    mdir = obj_root / "milk_model"
    os.makedirs(mdir, exist_ok=True)
    verts = rng.uniform(-0.05, 0.05, size=(4, 3))
    with open(mdir / "milk_model.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 4\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 2\nproperty list uchar int vertex_indices\n"
                "end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write("3 0 1 2\n3 1 2 3\n")
    models = load_objects(str(obj_root))
    np.testing.assert_allclose(models["milk"]["verts"], verts, atol=1e-6)
    np.testing.assert_array_equal(models["milk"]["faces"], [[0, 1, 2], [1, 2, 3]])

    sample = {"subject": "Subject_5", "action_name": "pour", "seq_idx": "1",
              "frame_idx": 1}
    tdir = tmp_path / "Object_6D_pose_annotation_v1" / "Subject_5" / "pour" / "1"
    os.makedirs(tdir, exist_ok=True)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [10, 20, 30]
    with open(tdir / "object_pose.txt", "w") as f:
        f.write("0 " + " ".join("0" for _ in range(16)) + "\n")
        f.write("1 " + " ".join(str(x) for x in t.T.reshape(-1)) + "\n")
    got = get_obj_transform(sample, str(tmp_path / "Object_6D_pose_annotation_v1"))
    np.testing.assert_allclose(got, t, atol=1e-6)   # file stores transposed

    cam = transform_obj_verts(verts, t)
    expected = (CAM_EXTR @ np.concatenate(
        [verts * 1000 + [10, 20, 30], np.ones((4, 1))], 1).T).T[:, :3]
    np.testing.assert_allclose(cam, expected, atol=1e-4)

    skel_dir = tmp_path / "Hand_pose_annotation_v1" / "Subject_5" / "pour" / "1"
    os.makedirs(skel_dir, exist_ok=True)
    sk = rng.uniform(-10, 10, size=(2, 21, 3))
    with open(skel_dir / "skeleton.txt", "w") as f:
        for i in range(2):
            f.write(" ".join([str(i)] + [str(v) for v in sk[i].reshape(-1)]) + "\n")
    got_sk = get_skeleton(sample, str(tmp_path / "Hand_pose_annotation_v1"))
    np.testing.assert_allclose(got_sk, sk[1], rtol=1e-6)


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

    # --- golden check: transliteration of the reference's GT pipeline
    # (STB_dataset.py:85-100 SK_rot_mx, 184-195 SK_xyz_depth2color/palm2wrist,
    #  152-155 pipeline order: depth2color -> Snap remap -> /10 -> palm2wrist)
    import math
    import numpy.linalg as LA

    def ref_sk_rot_mx(rot_vec):
        theta = LA.norm(rot_vec)
        v = np.array(rot_vec) * math.sin(theta / 2.0) / theta
        a = math.cos(theta / 2.0)
        b, c, d = -v
        return np.array(
            [[a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
             [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
             [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c]])

    stb_joints = ['loc_bn_palm_L'] + [
        f'loc_bn_{f}_L_{i:02d}'
        for f in ('pinky', 'ring', 'mid', 'index', 'thumb') for i in range(1, 5)]
    snap_joints = ['loc_bn_palm_L'] + [
        f'loc_bn_{f}_L_{i:02d}'
        for f in ('thumb', 'index', 'mid', 'ring', 'pinky') for i in range(1, 5)]
    snap_id = {w: i for i, w in enumerate(snap_joints)}
    stb_to_snap = [snap_id[j] for j in stb_joints]

    rot = ref_sk_rot_mx([0.00531, -0.01196, 0.00301])
    trans = [-24.0381, -0.4563, -1.2326]
    golden = pose.transpose(2, 1, 0)                       # N x 21 x 3 depth
    golden = (golden - np.tile(trans, [n, 21, 1])).dot(rot)
    golden = golden[:, stb_to_snap, :] / 10.0              # Snap order, cm
    root_id, ring_id = snap_id['loc_bn_palm_L'], snap_id['loc_bn_ring_L_01']
    golden[:, root_id, :] = golden[:, ring_id, :] + \
        2.0 * (golden[:, root_id, :] - golden[:, ring_id, :])
    np.testing.assert_allclose(ds.pose_gts, golden, rtol=1e-5, atol=1e-4)
    # roots and reference-bone scales (STB_dataset.py:156-160, 198-204)
    np.testing.assert_allclose(ds.pose_roots, golden[:, root_id, :], rtol=1e-5)
    scale = np.linalg.norm(
        golden[:, snap_id['loc_bn_mid_L_02']] - golden[:, snap_id['loc_bn_mid_L_01']],
        axis=1)
    np.testing.assert_allclose(ds.pose_scales, scale, rtol=1e-5)


# -------------------------------------------------------------- HandGraph
def _handgraph_fixture(tmp_path, rng, n_poses=2, n_cams=2):
    """Reference on-disk protocol: images/l*/cam*/<..._l21_camNN_.MMMM.png>,
    name-prefixed label files (HandGraph_utils/utils.py:12-77)."""
    root = tmp_path / "HandGraph"
    labels = root / "3D_labels"
    os.makedirs(labels, exist_ok=True)
    with open(labels / "camPosition.txt", "w") as f:
        for p in range(n_poses):
            for c in range(n_cams):
                r = rng.uniform(-30, 30, size=3)
                f.write(f"cam{c+1:02d} 180.0 "
                        f"{10*p} {5*c} -40.0 {r[0]:.3f} {r[1]:.3f} {r[2]:.3f}\n")
    gestures = rng.uniform(-40, 40, size=(n_poses, 21, 3)) + [0, 0, 600]
    with open(labels / "handGestures.txt", "w") as f:
        for p in range(n_poses):
            for j in range(21):
                x, y, z = gestures[p, j]
                f.write(f"joint{j:02d} {x:.5f} {y:.5f} {z:.5f}\n")
    with open(labels / "val-camera.txt", "w") as f:
        f.write("cam02\n")
    for p in range(n_poses):
        for c in range(n_cams):
            name = f"handV2_gPoses_ren_l21_cam{c+1:02d}_.{p+1:04d}.png"
            path = root / "images" / "l21" / f"cam{c+1:02d}" / name
            _img(str(path), size=64, seed=p * 2 + c)
    return root, gestures


def test_handgraph_reader_roundtrip(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.handgraph import (
        HandGraphDataset, cam_projection, euler_xyz_to_rot_mx,
        extract_pose_camera_id, transform_global_to_cam)

    n_poses, n_cams = 2, 2
    _, gestures = _handgraph_fixture(tmp_path, rng, n_poses, n_cams)

    train = HandGraphDataset(str(tmp_path), "training")
    val = HandGraphDataset(str(tmp_path), "evaluation")
    assert len(train) + len(val) == n_poses * n_cams
    assert len(val) == n_poses            # the cam02 images
    assert all("cam02" in p for p in val.image_paths)

    # filename convention (utils.py:41-51)
    assert extract_pose_camera_id("handV2_l21_cam03_.0007.png") == (6, 2)

    s = train[0]
    assert s["pose2d"].shape == (21, 2)
    assert s["pose3d"].shape == (21, 3)
    assert np.isfinite(s["pose2d"]).all()

    # golden camera math vs the reference formulas (utils.py:80-140):
    # R = Rz Ry Rx with degree eulers, y/z flip, right-multiplication
    cam = train.all_camera_params[0][0]
    rad = np.deg2rad(cam[4:7])
    sx, cx = np.sin(rad[0]), np.cos(rad[0])
    sy, cy = np.sin(rad[1]), np.cos(rad[1])
    sz, cz = np.sin(rad[2]), np.cos(rad[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    np.testing.assert_allclose(euler_xyz_to_rot_mx(cam[4:7]), rz @ ry @ rx,
                               atol=1e-12)
    local = transform_global_to_cam(gestures[0], cam)
    expected = (gestures[0] - cam[1:4]) @ (rz @ ry @ rx @ np.diag([1., -1, -1]))
    np.testing.assert_allclose(local, expected, atol=1e-9)
    K = np.array([[cam[0], 0, 32.0], [0, cam[0], 32.0], [0, 0, 1.0]])
    uv = cam_projection(local, K)
    np.testing.assert_allclose(
        uv, (local @ K.T)[:, :2] / (local @ K.T)[:, 2:3], atol=1e-9)


def test_handgraph_keypoints_and_mesh_utils(tmp_path, rng):
    from hrnet_hand_pose_estimation_tpu.data.handgraph import (
        HandGraphDatasetKeypoints, cam_deprojection, get_mesh_tri_vertices,
        load_mesh_from_obj)
    from hrnet_hand_pose_estimation_tpu.data.transforms import build_transforms

    _handgraph_fixture(tmp_path, rng)
    cfg = _cfg(tmp_path)
    ds = HandGraphDatasetKeypoints(cfg, "training",
                                   transforms=build_transforms(cfg, False))
    s = ds[0]
    assert s["imgs"].shape == (64, 64, 3)
    assert s["heatmaps"].shape == (16, 16, 21)
    assert s["pose2d"].shape == (21, 2)

    # deprojection inverts projection at the reference depth
    K = np.array([[180.0, 0, 32.0], [0, 180.0, 32.0], [0, 0, 1.0]])
    pts = rng.uniform(-30, 30, size=(5, 3)) + [0, 0, 500]
    uv = (pts @ K.T)[:, :2] / (pts @ K.T)[:, 2:3]
    rays = cam_deprojection(uv, K, z=pts[:, 2:3])
    np.testing.assert_allclose(rays, pts, atol=1e-8)

    # obj loader: cube with an "arm" vertex range stripped + face reindexing
    obj = tmp_path / "hand.obj"
    with open(obj, "w") as f:
        for i in range(6):
            f.write(f"v {i}.0 {i+1}.0 {i+2}.0\n")
        for i in range(4):
            f.write("vn 0.0 0.0 1.0\nvn 0.0 0.0 1.0\nvn 0.0 0.0 1.0\n")
        f.write("f 1/1/1 2/2/2 3/3/3\n")    # touches arm range -> dropped
        f.write("f 1/1/1 2/2/2 6/6/6\n")    # survives, vertex 6 reindexed
    pts, vn, tri = load_mesh_from_obj(str(obj), arm_index_range=(2, 4))
    assert pts.shape == (4, 3)              # 6 vertices minus arm range [2,4)
    assert tri.shape == (1, 3)
    np.testing.assert_array_equal(tri[0], [0, 1, 3])   # 5 -> 5-2 = 3
    assert get_mesh_tri_vertices(pts, tri).shape == (1, 3, 3)


def test_rhd_fullframe_variant(tmp_path, rng):
    """The *_twohands readers' live path: full frame, more-visible hand,
    original-image coordinates (RHDDataset_twohands.py:63-96)."""
    from hrnet_hand_pose_estimation_tpu.data.legends import IDX_RHD
    from hrnet_hand_pose_estimation_tpu.data.rhd import (
        RHDFullFrameDataset, RHDFullFrameDatasetKeypoints)

    root = tmp_path / "RHD" / "training"
    n = 2
    anno = {}
    for i in range(n):
        _img(str(root / "color" / f"{i:05d}.png"), size=64, seed=i)
        uv = np.zeros((42, 3), np.float32)
        uv[0:21, 0] = rng.uniform(10, 54, 21)
        uv[0:21, 1] = rng.uniform(10, 54, 21)
        uv[0:21, 2] = 1.0
        uv[21:42, 2] = 0.0
        anno[i] = {"uv_vis": uv}
    with open(root / "anno_training.pickle", "wb") as f:
        pickle.dump(anno, f)

    ds = RHDFullFrameDataset(str(tmp_path), "training")
    s = ds[0]
    # no crop: original coordinates, corner (0,0), crop_size = frame width
    np.testing.assert_allclose(
        s["pose2d"], anno[0]["uv_vis"][0:21, :2][IDX_RHD], atol=1e-5)
    np.testing.assert_allclose(s["corner"], [0, 0])
    assert float(s["crop_size"]) == 64.0
    assert s["imgs"].shape == (64, 64, 3)

    cfg = _cfg(tmp_path)
    kp = RHDFullFrameDatasetKeypoints(cfg, "training",
                                      transforms=HandTransforms(64, [16]))
    sk = kp[0]
    assert sk["heatmaps"].shape == (16, 16, 21)
    assert sk["imgs"].shape == (64, 64, 3)
