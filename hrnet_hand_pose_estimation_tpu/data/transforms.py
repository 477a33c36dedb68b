"""Host-side image/keypoint transform chain.

Numpy re-design of reference lib/dataset/transforms/transforms.py:20-175 and
build.py:35-80.  Behavioural parity notes:
- the "no augmentation" path still runs the affine (scale=1, rot=0) which is
  an exact resize-to-input_size with joints scaled to each output_size —
  the ``h = 200 * scale`` convention with scale = short_side/200 reduces to
  res/side (transforms.py:98-122)
- RandomHorizontalFlip only flips u coordinates; the reference's joint
  index remap is commented out in its source (transforms.py:68) and the
  hand legend has no L/R pairs anyway
- output images are float32 NHWC, ImageNet-normalised (the reference's
  ToTensor+Normalize, minus the CHW transpose — TPU wants channels-last)

The chain is used by the host input pipeline; the fused device-side resize/
normalise for pure inference lives in ops/image.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# FLIP_CONFIG parity (reference transforms/build.py:15-33): identical table
# for every hand dataset; kept for API completeness even though the remap is
# inert in the reference pipeline.
FLIP_INDEX = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15, 17, 18, 19, 20]


def affine_matrix(center: Sequence[float], scale: float, res: Tuple[int, int],
                  rot: float = 0.0) -> np.ndarray:
    """3x3 affine with the reference's ``h = 200*scale`` convention
    (transforms.py:98-122).  res is (height, width)."""
    h = 200.0 * scale
    t = np.zeros((3, 3), np.float64)
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-float(center[0]) / h + 0.5)
    t[1, 2] = res[0] * (-float(center[1]) / h + 0.5)
    t[2, 2] = 1.0
    if rot != 0:
        rot = -rot
        rad = rot * np.pi / 180.0
        sn, cs = np.sin(rad), np.cos(rad)
        rot_mat = np.zeros((3, 3))
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        rot_mat[2, 2] = 1.0
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def affine_joints(joints: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply a 2x3 affine to (..., 2) joints (transforms.py:125-131)."""
    shape = joints.shape
    flat = joints.reshape(-1, 2)
    hom = np.concatenate([flat, np.ones_like(flat[:, :1])], axis=1)
    return (hom @ mat.T).reshape(shape)


class HandTransforms:
    """The full chain: affine warp -> optional u-flip -> normalise.

    __call__(image HxWx3 uint8/float, joints list of (K, >=2)) returns
    (float32 input_size x input_size x 3 normalised image, transformed joints
    list) — joints[i] mapped into output_size[i] coordinates.
    """

    def __init__(
        self,
        input_size: int = 256,
        output_size: Sequence[int] = (64,),
        max_rotation: float = 0.0,
        min_scale: float = 1.0,
        max_scale: float = 1.0,
        scale_type: str = "short",
        max_translate: float = 0.0,
        flip_prob: float = 0.0,
        scale_aware_sigma: bool = False,
        rng: Optional[np.random.Generator] = None,
    ):
        self.input_size = int(input_size)
        self.output_size = [int(s) for s in output_size]
        self.max_rotation = float(max_rotation)
        self.min_scale = float(min_scale)
        self.max_scale = float(max_scale)
        self.scale_type = scale_type
        self.max_translate = float(max_translate)
        self.flip_prob = float(flip_prob)
        self.scale_aware_sigma = scale_aware_sigma
        self.rng = rng or np.random.default_rng()

    def __call__(self, image: np.ndarray, joints: List[np.ndarray]):
        assert isinstance(joints, list)
        joints = [j.astype(np.float64).copy() for j in joints]
        height, width = image.shape[:2]
        center = np.array((width / 2.0, height / 2.0))
        if self.scale_type == "long":
            scale = max(height, width) / 200.0
        elif self.scale_type == "short":
            scale = min(height, width) / 200.0
        else:
            raise ValueError(f"unknown scale type {self.scale_type!r}")

        aug_scale = self.rng.random() * (self.max_scale - self.min_scale) + self.min_scale
        scale *= aug_scale
        aug_rot = (self.rng.random() * 2.0 - 1.0) * self.max_rotation
        if self.max_translate > 0:
            lim = int(self.max_translate * scale)
            center[0] += self.rng.integers(-lim, lim)
            center[1] += self.rng.integers(-lim, lim)

        for i, out_size in enumerate(self.output_size):
            mat = affine_matrix(center, scale, (out_size, out_size), aug_rot)[:2]
            joints[i][:, 0:2] = affine_joints(joints[i][:, 0:2], mat)
            if self.scale_aware_sigma and joints[i].shape[1] > 3:
                joints[i][:, 3] = joints[i][:, 3] / aug_scale

        mat_input = affine_matrix(center, scale, (self.input_size, self.input_size), aug_rot)[:2]
        image = cv2.warpAffine(
            np.ascontiguousarray(image), mat_input,
            (self.input_size, self.input_size),
        )

        if self.flip_prob and self.rng.random() < self.flip_prob:
            image = image[:, ::-1].copy()
            for i, out_size in enumerate(self.output_size):
                joints[i][:, 0] = out_size - joints[i][:, 0] - 1

        image = normalize_image(image)
        return image, joints


def normalize_image(image: np.ndarray) -> np.ndarray:
    """uint8/float HWC -> float32 HWC, /255 + ImageNet normalise
    (reference ToTensor+Normalize, transforms.py:38-51)."""
    img = image.astype(np.float32)
    if image.dtype == np.uint8 or img.max() > 2.0:
        img = img / 255.0
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_image(image: np.ndarray) -> np.ndarray:
    return np.clip((image * IMAGENET_STD + IMAGENET_MEAN) * 255.0, 0, 255).astype(np.uint8)


def build_transforms(cfg, is_train: bool = True,
                     rng: Optional[np.random.Generator] = None) -> HandTransforms:
    """Config-driven chain (reference transforms/build.py:35-80): augmentation
    parameters only apply when training with WITH_DATA_AUG."""
    if is_train and cfg.WITH_DATA_AUG:
        return HandTransforms(
            input_size=int(cfg.MODEL.IMAGE_SIZE[0]),
            output_size=[int(cfg.MODEL.HEATMAP_SIZE[0])],
            max_rotation=float(cfg.DATASET.MAX_ROTATION),
            min_scale=float(cfg.DATASET.MIN_SCALE),
            max_scale=float(cfg.DATASET.MAX_SCALE),
            scale_type=str(cfg.DATASET.SCALE_TYPE),
            max_translate=float(cfg.DATASET.MAX_TRANSLATE),
            flip_prob=float(bool(cfg.DATASET.FLIP)),
            scale_aware_sigma=bool(cfg.DATASET.SCALE_AWARE_SIGMA),
            rng=rng,
        )
    return HandTransforms(
        input_size=int(cfg.MODEL.IMAGE_SIZE[0]),
        output_size=[int(cfg.MODEL.HEATMAP_SIZE[0])],
        scale_type=str(cfg.DATASET.SCALE_TYPE),
        rng=rng,
    )
