"""HandGraph (CMU "3D Hand Shape and Pose" synthetic) dataset reader.

Re-design of reference lib/dataset/HandGraphDataset.py:34-135 +
HandGraphDatasetKeypoints.py.  Layout:
- ``images/`` RGBA 360x360 renders named ``..._<pose>_..._cam<cid>...``
- ``3D_labels/camPosition.txt`` 7-dof camera params per (pose, cam)
- ``3D_labels/handGestures.txt`` global 3D pose GT
- ``3D_labels/val-camera.txt`` camera ids forming the validation split

2D GT is the pinhole projection of the camera-frame pose with
``K = [[f,0,W/2],[0,f,H/2],[0,0,1]]`` (HandGraphDataset.py:78-86); joints
are already in standard-legend order (standard_legends.py idx_HandGraph).
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import List

import cv2
import numpy as np

from ..ops.targets import gaussian_targets_np


def load_camera_params(path: str) -> np.ndarray:
    """camPosition.txt -> (N_poses, N_cams, 7)."""
    vals = np.loadtxt(path)
    if vals.ndim == 1:
        vals = vals[None]
    n_cams = 1
    # file stores one row per (pose, cam); infer cams from repeated pose ids
    return vals.reshape(-1, 7)[None] if vals.shape[-1] == 7 else vals


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def transform_global_to_cam(pose3d: np.ndarray, cam_param: np.ndarray) -> np.ndarray:
    """7-dof (f, tx, ty, tz, rx..) camera: world -> camera frame
    (reference HandGraph_utils.utils.transform_global_to_cam semantics)."""
    # cam_param: [focal, quat(4), ...] or [focal, pos(3), lookat...]; the
    # reference stores focal + position + orientation; apply R(x - t)
    t = cam_param[1:4]
    if len(cam_param) >= 8:
        R = quat_to_rot(cam_param[4:8])
    else:
        R = np.eye(3)
    return (R @ (pose3d - t).T).T


class HandGraphDataset:
    name = "HandGraph"
    orig_img_size = (360, 360)

    def __init__(self, root: str, set_name: str, data_format=None, transforms=None):
        self.data_dir = osp.join(root, self.name)
        self.transform = transforms
        labels = osp.join(self.data_dir, "3D_labels")
        self.cam_params = np.loadtxt(osp.join(labels, "camPosition.txt"))
        self.pose3d_gt = np.loadtxt(osp.join(labels, "handGestures.txt"))
        self.pose3d_gt = self.pose3d_gt.reshape(-1, 21, 3)
        with open(osp.join(labels, "val-camera.txt")) as f:
            val_cams = {line.strip() for line in f if line.strip()}
        image_dir = osp.join(self.data_dir, "images")
        paths = sorted(
            osp.join(image_dir, p) for p in os.listdir(image_dir)
            if p.lower().endswith((".png", ".jpg"))
        )
        is_val = lambda p: any(c in osp.basename(p) for c in val_cams)
        if set_name in ("train", "training"):
            self.image_paths: List[str] = [p for p in paths if not is_val(p)]
        else:
            self.image_paths = [p for p in paths if is_val(p)]
        n_poses = self.pose3d_gt.shape[0]
        self.cam_params = self.cam_params.reshape(n_poses, -1, self.cam_params.shape[-1])

    def __len__(self):
        return len(self.image_paths)

    @staticmethod
    def _ids_from_name(name: str):
        nums = [int(x) for x in re.findall(r"\d+", name)]
        pose_id = nums[0] if nums else 0
        cam_id = nums[1] if len(nums) > 1 else 0
        return pose_id, cam_id

    def _load_raw(self, idx: int):
        img_path = self.image_paths[idx]
        pose_id, cam_id = self._ids_from_name(osp.basename(img_path))
        cam = self.cam_params[pose_id % len(self.cam_params)][
            cam_id % self.cam_params.shape[1]]
        pose3d_cam = transform_global_to_cam(
            self.pose3d_gt[pose_id % len(self.pose3d_gt)], cam)
        rgba = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
        img = cv2.cvtColor(rgba[:, :, :3], cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        fl = cam[0]
        K = np.array([[fl, 0, w / 2.0], [0, fl, h / 2.0], [0, 0, 1.0]], np.float32)
        uvw = (K @ pose3d_cam.T).T
        pose2d = (uvw[:, :2] / uvw[:, 2:3]).astype(np.float32)
        return img, pose2d, pose3d_cam.astype(np.float32), K, img_path

    def __getitem__(self, idx: int):
        img, pose2d, pose3d, K, img_path = self._load_raw(idx)
        if self.transform is not None:
            img, joints = self.transform(img, [pose2d])
            pose2d = np.asarray(joints[0], np.float32)
        return {
            "imgs": np.asarray(img, np.float32),
            "pose2d": pose2d,
            "pose3d": pose3d,
            "visibility": np.ones((21, 1), np.float32),
            "K": K,
            "img_path": img_path,
        }


class HandGraphDatasetKeypoints(HandGraphDataset):
    def __init__(self, cfg, set_name: str, heatmap_generator=None, transforms=None):
        super().__init__(cfg.DATA_DIR, set_name, cfg.DATASET.DATA_FORMAT, None)
        self.transforms = transforms
        self.hm_size = int(cfg.MODEL.HEATMAP_SIZE[0])
        self.sigma = float(cfg.MODEL.SIGMA)
        self.heatmap_generator = heatmap_generator
        self.exception = False

    def __getitem__(self, idx: int):
        img, pose2d, pose3d, K, _ = self._load_raw(idx)
        img, joints = self.transforms(img, [pose2d])
        pose2d = np.asarray(joints[0], np.float32)
        vis = np.ones((21,), np.float32)
        hms = (self.heatmap_generator(pose2d, vis) if self.heatmap_generator
               else gaussian_targets_np(pose2d, vis, self.hm_size, self.sigma))
        return {
            "imgs": img.astype(np.float32),
            "pose2d": pose2d,
            "pose3d": pose3d,
            "heatmaps": hms.astype(np.float32),
            "visibility": vis[:, None],
        }
