"""COCO / MPII human-pose dataset readers (upstream-parity tier).

Re-design of the reference's inherited human-pose datasets
(lib/dataset/coco.py:445, mpii.py:181, JointsDataset.py base) — VEST for
the hand task (SURVEY.md §2.2) but part of the upstream API surface:
- COCO: keypoint annotations from ``person_keypoints_*.json`` (pure-json,
  no pycocotools dependency), GT-bbox samples with the reference's
  center/scale convention (h = bbox/200), OKS-NMS rescoring for results
  (ops/nms.py replaces the native nms build)
- MPII: ``mpii_*.json`` annotations with center/scale entries

Both yield the same record schema as the hand datasets (imgs/pose2d/
visibility/heatmaps) through the shared transform chain.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..ops.targets import gaussian_targets_np


def bbox_to_center_scale(bbox, aspect_ratio: float, pixel_std: float = 200.0):
    """COCO bbox -> (center, scale) (reference coco.py _box2cs semantics)."""
    x, y, w, h = bbox
    center = np.array([x + w * 0.5, y + h * 0.5], np.float32)
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    else:
        w = h * aspect_ratio
    scale = np.array([w / pixel_std, h / pixel_std], np.float32) * 1.25
    return center, scale


class COCOKeypointsDataset:
    name = "COCO"
    num_joints = 17

    def __init__(self, root: str, set_name: str = "val2017",
                 transforms=None, hm_size: int = 64, sigma: float = 2.0):
        self.img_dir = os.path.join(root, "images", set_name)
        ann_file = os.path.join(root, "annotations",
                                f"person_keypoints_{set_name}.json")
        with open(ann_file) as f:
            data = json.load(f)
        images = {im["id"]: im for im in data["images"]}
        self.samples: List[Dict] = []
        for ann in data["annotations"]:
            if ann.get("num_keypoints", 0) <= 0 or ann.get("iscrowd"):
                continue
            kps = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
            self.samples.append({
                "file": images[ann["image_id"]]["file_name"],
                "keypoints": kps,
                "bbox": ann["bbox"],
                "area": ann.get("area", ann["bbox"][2] * ann["bbox"][3]),
            })
        self.transforms = transforms
        self.hm_size = hm_size
        self.sigma = sigma
        self.exception = False

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        s = self.samples[idx]
        img = cv2.cvtColor(cv2.imread(os.path.join(self.img_dir, s["file"])),
                           cv2.COLOR_BGR2RGB)
        kps = s["keypoints"].copy()
        x, y, w, h = [int(v) for v in s["bbox"]]
        x, y = max(0, x), max(0, y)
        crop = img[y:y + max(h, 1), x:x + max(w, 1)]
        kps[:, :2] -= [x, y]
        vis = (kps[:, 2] > 0).astype(np.float32)
        if self.transforms is not None:
            crop, joints = self.transforms(crop, [kps[:, :2]])
            pose2d = np.asarray(joints[0], np.float32)
        else:
            pose2d = kps[:, :2]
        hms = gaussian_targets_np(pose2d, vis, self.hm_size, self.sigma)
        return {
            "imgs": np.asarray(crop, np.float32),
            "pose2d": pose2d,
            "heatmaps": hms.astype(np.float32),
            "visibility": vis[:, None],
        }

    def evaluate_oks(self, preds: np.ndarray, scores: np.ndarray,
                     oks_thresh: float = 0.9):
        """OKS-NMS rescoring of predictions (the role the native nms build
        played in reference coco.py's evaluate)."""
        import jax.numpy as jnp

        from ..ops.nms import oks_nms

        areas = np.asarray([s["area"] for s in self.samples[: len(preds)]],
                           np.float32)
        kpts = np.concatenate(
            [preds[..., :2], np.ones((*preds.shape[:2], 1), np.float32)], -1)
        keep = oks_nms(jnp.asarray(kpts), jnp.asarray(scores),
                       jnp.asarray(areas), oks_thresh)
        return np.asarray(keep)


class MPIIDataset:
    name = "MPII"
    num_joints = 16

    def __init__(self, root: str, set_name: str = "valid",
                 transforms=None, hm_size: int = 64, sigma: float = 2.0):
        ann_file = os.path.join(root, "annot", f"{set_name}.json")
        with open(ann_file) as f:
            self.anns = json.load(f)
        self.img_dir = os.path.join(root, "images")
        self.transforms = transforms
        self.hm_size = hm_size
        self.sigma = sigma
        self.exception = False

    def __len__(self):
        return len(self.anns)

    def __getitem__(self, idx: int):
        a = self.anns[idx]
        img = cv2.cvtColor(cv2.imread(os.path.join(self.img_dir, a["image"])),
                           cv2.COLOR_BGR2RGB)
        joints = np.asarray(a["joints"], np.float32)
        vis = np.asarray(a["joints_vis"], np.float32)
        center = np.asarray(a["center"], np.float32)
        scale = float(a["scale"]) * 200.0
        half = scale / 2.0
        x0, y0 = int(max(0, center[0] - half)), int(max(0, center[1] - half))
        crop = img[y0:y0 + int(scale), x0:x0 + int(scale)]
        joints = joints - [x0, y0]
        if self.transforms is not None:
            crop, jl = self.transforms(crop, [joints])
            joints = np.asarray(jl[0], np.float32)
        hms = gaussian_targets_np(joints, vis, self.hm_size, self.sigma)
        return {
            "imgs": np.asarray(crop, np.float32),
            "pose2d": joints,
            "heatmaps": hms.astype(np.float32),
            "visibility": vis[:, None],
        }
