"""Gaussian heatmap target generation, vectorised for device execution.

The reference stamps a precomputed (6*sigma+3)^2 Gaussian patch per visible
joint with python loops on the host (lib/dataset/target_generators/
target_generators.py:15-53).  Here the same function is a closed-form
broadcast over the full (B, H, W, K) grid, bit-matching the reference's
semantics:

- joint centre is the *truncated-int* coordinate (reference :38 ``int(pt[0])``)
- joints outside the map or with visibility <= 0 produce empty maps (:37-41)
- the patch window is ``|px - x| <= 3*sigma + 1`` in both axes (:43-52), i.e.
  values beyond the window are exactly zero even though the Gaussian is not.

Runs equally under jit on TPU (fused into the input pipeline's device step)
or eagerly on CPU inside the numpy pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_targets(
    joints: jax.Array,
    visibility: jax.Array,
    output_res: int,
    sigma: float = 2.0,
) -> jax.Array:
    """Generate (B, H, W, K) heatmap targets.

    joints: (B, K, 2) [u, v] in heatmap pixels (float).
    visibility: (B, K) — joint contributes iff > 0 (reference :37).
    """
    x = jnp.trunc(joints[..., 0]).astype(jnp.int32)  # (B, K)
    y = jnp.trunc(joints[..., 1]).astype(jnp.int32)
    in_range = (x >= 0) & (y >= 0) & (x < output_res) & (y < output_res)
    valid = (visibility > 0) & in_range  # (B, K)

    px = jnp.arange(output_res, dtype=jnp.int32)
    dx = px[None, :, None] - x[:, None, :]              # (B, W, K)
    dy = px[None, :, None] - y[:, None, :]              # (B, H, K)

    win = int(3 * sigma + 1)
    sig2 = 2.0 * float(sigma) ** 2
    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / sig2) * (jnp.abs(dx) <= win)
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / sig2) * (jnp.abs(dy) <= win)

    hm = gy[:, :, None, :] * gx[:, None, :, :]          # (B, H, W, K)
    return hm * valid[:, None, None, :].astype(jnp.float32)


def gaussian_targets_np(
    joints: np.ndarray, visibility: np.ndarray, output_res: int, sigma: float = 2.0
) -> np.ndarray:
    """Numpy twin of :func:`gaussian_targets` for the host input pipeline."""
    joints = np.asarray(joints, dtype=np.float32)
    single = joints.ndim == 2
    if single:
        joints = joints[None]
        visibility = np.asarray(visibility)[None]
    x = np.trunc(joints[..., 0]).astype(np.int32)
    y = np.trunc(joints[..., 1]).astype(np.int32)
    in_range = (x >= 0) & (y >= 0) & (x < output_res) & (y < output_res)
    valid = (np.asarray(visibility) > 0) & in_range

    px = np.arange(output_res, dtype=np.int32)
    dx = px[None, :, None] - x[:, None, :]
    dy = px[None, :, None] - y[:, None, :]
    win = int(3 * sigma + 1)
    sig2 = 2.0 * float(sigma) ** 2
    gx = np.exp(-(dx.astype(np.float32) ** 2) / sig2) * (np.abs(dx) <= win)
    gy = np.exp(-(dy.astype(np.float32) ** 2) / sig2) * (np.abs(dy) <= win)
    hm = gy[:, :, None, :] * gx[:, None, :, :]
    hm = hm * valid[:, None, None, :].astype(np.float32)
    return hm[0] if single else hm


def scale_aware_gaussian_targets(
    joints: jax.Array,
    visibility: jax.Array,
    sigmas: jax.Array,
    output_res: int,
) -> jax.Array:
    """Per-joint-sigma variant (reference ScaleAwareHeatmapGenerator :56-92).

    sigmas: (B, K) per-joint Gaussian widths.  The stamp window follows the
    same ``3*sigma + 1`` rule, evaluated per joint.
    """
    x = jnp.trunc(joints[..., 0]).astype(jnp.int32)
    y = jnp.trunc(joints[..., 1]).astype(jnp.int32)
    in_range = (x >= 0) & (y >= 0) & (x < output_res) & (y < output_res)
    valid = (visibility > 0) & in_range

    px = jnp.arange(output_res, dtype=jnp.int32)
    dx = px[None, :, None] - x[:, None, :]
    dy = px[None, :, None] - y[:, None, :]
    win = jnp.trunc(3.0 * sigmas + 1.0)[:, None, :]     # (B, 1, K)
    sig2 = 2.0 * sigmas[:, None, :] ** 2
    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / sig2) * (jnp.abs(dx) <= win)
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / sig2) * (jnp.abs(dy) <= win)
    hm = gy[:, :, None, :] * gx[:, None, :, :]
    return hm * valid[:, None, None, :].astype(jnp.float32)


def gaussian_centermap(center: jax.Array, res: int, sigma: float = 3.0) -> jax.Array:
    """CPM-style single-channel centre map (reference MHP_CPMDataset.py:220-224:
    unwindowed Gaussian with sigma 3, clipped to <=1 and zeroed below 0.0099).

    center: (B, 2) [u, v] in input pixels; returns (B, res, res, 1).
    """
    px = jnp.arange(res, dtype=jnp.float32)
    du = px[None, :] - center[:, 0:1]
    dv = px[None, :] - center[:, 1:2]
    sig2 = 2.0 * float(sigma) ** 2
    g = jnp.exp(-(dv[:, :, None] ** 2 + du[:, None, :] ** 2) / sig2)
    g = jnp.minimum(g, 1.0) * (g >= 0.0099)
    return g[..., None]


def cpm_heatmaps_np(pose2d: np.ndarray, hm_size: int, sigma: float,
                    stride: float) -> np.ndarray:
    """22-channel CPM target (reference MHP_CPMDataset.py:193-204): channel 0
    is the background ``1 - max(joints)``; joint channels are unwindowed
    Gaussians at int-truncated, stride-divided coordinates, clipped to <=1
    and zeroed below 0.0099.  Returns (hm_size, hm_size, K+1) HWC."""
    k = pose2d.shape[0]
    grid = np.arange(hm_size, dtype=np.float32)
    joints = np.zeros((hm_size, hm_size, k), np.float32)
    for i in range(k):
        x = int(pose2d[i, 0]) * 1.0 / stride
        y = int(pose2d[i, 1]) * 1.0 / stride
        g = np.exp(-((grid[None, :] - x) ** 2 + (grid[:, None] - y) ** 2)
                   / 2.0 / sigma / sigma)
        g[g > 1] = 1
        g[g < 0.0099] = 0
        joints[:, :, i] = g
    bg = 1.0 - joints.max(axis=2, keepdims=True)
    return np.concatenate([bg, joints], axis=2)
