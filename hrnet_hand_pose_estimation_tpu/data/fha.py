"""FHA (First-Person Hand Action) dataset reader.

Re-design of reference lib/dataset/FHADataset.py:30-231 + FHA_utils.py.
Layout (subject/action/video hierarchy):
- ``Videos/Subject_k/<action>/<seq>/color/color_%04d.jpeg``
- ``Hand_pose_annotation_v1/Subject_k/<action>/<seq>/skeleton.txt`` with a
  frame id + 63 floats (21 world-coord joints) per row

The FHA camera intrinsics/extrinsics are the published constants; 2D GT is
the projection of the world skeleton through them (FHA_utils).  Joints are
standard-legend ordered (standard_legends.py idx_FHA).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import List, Tuple

import cv2
import numpy as np

from ..ops.targets import gaussian_targets_np

# published FHA color-camera calibration (reference FHA_utils.py)
CAM_EXTR = np.array([
    [0.999988496304, -0.00468848412856, 0.000982563360594, 25.7],
    [0.00469115935266, 0.999985218048, -0.00273845880292, 1.22],
    [-0.000969709653873, 0.00274303671904, 0.99999576807, 3.902],
], dtype=np.float64)
CAM_INTR = np.array([
    [1395.749023, 0.0, 935.732544],
    [0.0, 1395.749268, 540.681030],
    [0.0, 0.0, 1.0],
], dtype=np.float64)
ORIG_SIZE = (1920, 1080)

TRAIN_SUBJECTS = ["Subject_1", "Subject_2", "Subject_3", "Subject_4"]
EVAL_SUBJECTS = ["Subject_5", "Subject_6"]


def project_fha(skel_world: np.ndarray) -> np.ndarray:
    """World skeleton (21, 3) -> image plane (21, 2) (reference FHA_utils)."""
    hom = np.concatenate([skel_world, np.ones((21, 1))], axis=1)
    cam = (CAM_EXTR @ hom.T).T
    uvw = (CAM_INTR @ cam.T).T
    return (uvw[:, :2] / uvw[:, 2:3]).astype(np.float32)


class FHADataset:
    name = "FHA"
    orig_img_size = list(ORIG_SIZE)

    def __init__(self, root: str, set_name: str, data_format=None, transforms=None):
        self.video_root = osp.join(root, self.name, "Videos")
        self.skel_root = osp.join(root, self.name, "Hand_pose_annotation_v1")
        self.transform = transforms
        subjects = TRAIN_SUBJECTS if set_name in ("train", "training") else EVAL_SUBJECTS
        self.samples: List[Tuple[str, int]] = []   # (video_rel_dir, frame_idx)
        self.skeletons = {}
        for sub in subjects:
            sub_dir = osp.join(self.video_root, sub)
            if not osp.isdir(sub_dir):
                continue
            for action in sorted(os.listdir(sub_dir)):
                for seq in sorted(os.listdir(osp.join(sub_dir, action))):
                    rel = osp.join(sub, action, seq)
                    skel_path = osp.join(self.skel_root, rel, "skeleton.txt")
                    color_dir = osp.join(self.video_root, rel, "color")
                    if not (osp.isfile(skel_path) and osp.isdir(color_dir)):
                        continue
                    vals = np.loadtxt(skel_path)
                    if vals.ndim == 1:
                        vals = vals[None]
                    self.skeletons[rel] = vals[:, 1:].reshape(-1, 21, 3)
                    n = min(len(vals), len(os.listdir(color_dir)))
                    self.samples += [(rel, i) for i in range(n)]

    def __len__(self):
        return len(self.samples)

    def _load_raw(self, idx: int):
        rel, frame = self.samples[idx]
        img_path = osp.join(self.video_root, rel, "color", "color_%04d.jpeg" % frame)
        img = cv2.cvtColor(
            cv2.imread(img_path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION),
            cv2.COLOR_BGR2RGB)
        skel = self.skeletons[rel][frame]
        pose2d = project_fha(skel)
        return img, pose2d, skel.astype(np.float32), img_path

    def __getitem__(self, idx: int):
        img, pose2d, pose3d, img_path = self._load_raw(idx)
        if self.transform is not None:
            img, joints = self.transform(img, [pose2d])
            pose2d = np.asarray(joints[0], np.float32)
        return {
            "imgs": np.asarray(img, np.float32),
            "pose2d": pose2d,
            "pose3d": pose3d,
            "visibility": np.ones((21, 1), np.float32),
            "img_path": img_path,
        }


class FHADatasetKeypoints(FHADataset):
    def __init__(self, cfg, set_name: str, heatmap_generator=None, transforms=None):
        super().__init__(cfg.DATA_DIR, set_name, cfg.DATASET.DATA_FORMAT, None)
        self.transforms = transforms
        self.hm_size = int(cfg.MODEL.HEATMAP_SIZE[0])
        self.sigma = float(cfg.MODEL.SIGMA)
        self.heatmap_generator = heatmap_generator
        self.exception = False

    def __getitem__(self, idx: int):
        img, pose2d, pose3d, _ = self._load_raw(idx)
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
