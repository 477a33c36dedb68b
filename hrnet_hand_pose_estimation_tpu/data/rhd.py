"""RHD (Rendered Hand Dataset) reader.

Re-design of reference lib/dataset/RHDDataset.py:25-139 and
RHDDatasetKeypoints.py:96-140.  Behavioural parity:
- per-sample hand selection: the hand (of the 42 annotated keypoints) with
  more visible joints (RHDDataset.py:74-82)
- square crop of side ``min(W, int(2*max(w, h)))`` around the hand bbox,
  clamped into the image (:84-101)
- joints reordered into the standard legend by IDX_RHD, crop corner and
  size carried through for eval-time rescale (tools/evaluate_2D.py:235-239)
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import cv2
import numpy as np

from ..ops.targets import gaussian_targets_np
from .legends import IDX_RHD


class RHDDataset:
    """Raw RHD samples (crop + joints in crop coords)."""

    name = "RHD"
    orig_img_size = (320, 320)
    # eval-time rescale back to the original image goes through the crop
    # corner + crop size carried in each sample (tools/evaluate_2D.py:235-239)
    rescale = "crop_corner"

    def __init__(self, root: str, subset: str, data_format: Optional[str] = None,
                 transforms=None):
        self.data_dir = os.path.join(root, self.name, subset)
        self.transform = transforms
        anno_path = os.path.join(self.data_dir, f"anno_{subset}.pickle")
        with open(anno_path, "rb") as f:
            self.anno_all = pickle.load(f)
        self.images = sorted(os.listdir(os.path.join(self.data_dir, "color")))
        self.reorder_idx = IDX_RHD

    def __len__(self) -> int:
        return len(self.images)

    def _load_raw(self, idx: int):
        img_path = os.path.join(self.data_dir, "color", self.images[idx])
        img = cv2.imread(img_path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        orig_img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

        anno = self.anno_all[idx]
        uv_vis = np.asarray(anno["uv_vis"])
        kp_uv = uv_vis[:, :2]
        kp_vis = uv_vis[:, 2:] == 1

        # pick the more-visible hand (RHDDataset.py:74-82)
        if kp_vis[0:21].sum() >= kp_vis[21:42].sum():
            pose2d, vis = kp_uv[0:21], kp_vis[0:21]
        else:
            pose2d, vis = kp_uv[21:42], kp_vis[21:42]

        # clamped square crop (RHDDataset.py:84-101)
        x, y = pose2d[:, 0], pose2d[:, 1]
        left, right = np.min(x), np.max(x)
        bottom, top = np.max(y), np.min(y)
        w, h = right - left, bottom - top
        crop_size = min(img.shape[1], int(2 * w if w > h else 2 * h))
        corner = [
            max(0, min(int(left - (crop_size - w) / 2), img.shape[0] - crop_size)),
            max(0, min(img.shape[1] - crop_size, int(top - (crop_size - h) / 2))),
        ]
        cropped = orig_img[corner[1]:corner[1] + crop_size,
                           corner[0]:corner[0] + crop_size, :]
        pose2d = pose2d - np.asarray(corner)
        return orig_img, cropped, pose2d, vis.astype(np.float32), np.asarray(corner), crop_size

    def __getitem__(self, idx: int):
        orig_img, cropped, pose2d, vis, corner, crop_size = self._load_raw(idx)
        if self.transform is not None:
            cropped, joints = self.transform(cropped, [pose2d])
            pose2d = joints[0]
        return {
            "orig_imgs": orig_img,
            "imgs": np.ascontiguousarray(cropped, np.float32),
            "pose2d": np.asarray(pose2d, np.float32)[self.reorder_idx],
            "visibility": vis,
            "corner": corner.astype(np.float32),
            "crop_size": np.float32(crop_size),
        }


class RHDDatasetKeypoints(RHDDataset):
    """Adds the transform chain + Gaussian heatmap targets
    (reference RHDDatasetKeypoints.py:96-140)."""

    def __init__(self, cfg, subset: str, heatmap_generator=None, transforms=None):
        root = cfg.DATA_DIR
        super().__init__(root, subset, cfg.DATASET.DATA_FORMAT, None)
        self.transforms = transforms
        self.hm_size = int(cfg.MODEL.HEATMAP_SIZE[0])
        self.sigma = float(cfg.MODEL.SIGMA)
        self.heatmap_generator = heatmap_generator
        self.exception = False  # reference datasets carry a bad-sample flag

    def __getitem__(self, idx: int):
        orig_img, cropped, pose2d, vis, corner, crop_size = self._load_raw(idx)
        img, joints = self.transforms(cropped, [pose2d])
        pose2d = np.asarray(joints[0], np.float32)[self.reorder_idx]
        # NOTE: the reference reorders pose2d but not visibility
        # (RHDDataset.py:117-126) — we reorder both so masks stay aligned.
        vis = vis[self.reorder_idx]
        if self.heatmap_generator is not None:
            heatmaps = self.heatmap_generator(pose2d, vis[:, 0])
        else:
            heatmaps = gaussian_targets_np(pose2d, vis[:, 0], self.hm_size, self.sigma)
        return {
            "imgs": img.astype(np.float32),
            "pose2d": pose2d,
            "heatmaps": heatmaps.astype(np.float32),
            "visibility": vis.astype(np.float32),
            "corner": corner.astype(np.float32),
            "crop_size": np.float32(crop_size),
        }


class RHDFullFrameDataset(RHDDataset):
    """Full-frame RHD variant (reference RHDDataset_twohands.py:36-96 /
    RHDDatasetKeypoints_twohands.py:110-124).

    Despite the filename, the live code path of the reference's *_twohands
    readers returns the UNCROPPED 320x320 frame with the more-visible hand's
    21 joints in original image coordinates (the actual two-hand annotation
    branches are commented out upstream); it exists for full-frame training
    experiments.  Joint order follows the same standard-legend reorder."""

    def _load_raw(self, idx: int):
        img_path = os.path.join(self.data_dir, "color", self.images[idx])
        img = cv2.imread(img_path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        orig_img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

        uv_vis = np.asarray(self.anno_all[idx]["uv_vis"])
        # the more-visible hand, full-frame coords (twohands getitem :78-86);
        # strict > — unlike the cropped reader, the reference's twohands
        # variant picks the RIGHT hand on visibility ties
        if uv_vis[0:21, 2].sum() > uv_vis[21:42, 2].sum():
            joints = uv_vis[0:21]
        else:
            joints = uv_vis[21:42]
        pose2d = joints[:, :2]
        vis = (joints[:, 2:] == 1).astype(np.float32)
        corner = np.zeros(2)
        return orig_img, orig_img, pose2d, vis, corner, np.float32(img.shape[1])


class RHDFullFrameDatasetKeypoints(RHDDatasetKeypoints, RHDFullFrameDataset):
    """Transform chain + heatmaps over the full frame (the *_twohands
    keypoint subclass, RHDDatasetKeypoints_twohands.py:110-124)."""
