"""Horizontal-flip utilities for flip-test TTA and joint augmentation.

Mirrors reference lib/utils/transforms.py:16-47 on NHWK heatmaps / (K, 2)
joints.  Hand pose has no left/right joint pairs (data/legends.py), so the
pair swap is usually a no-op, but the mechanism is kept for datasets that
define pairs (e.g. COCO-style eval).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def flip_back(heatmaps: jax.Array, matched_parts: Sequence[Tuple[int, int]] = ()) -> jax.Array:
    """Un-flip heatmaps predicted on a horizontally flipped input.

    heatmaps: (B, H, W, K).  Reference transforms.py:16-30 (NCHW there).
    """
    out = heatmaps[:, :, ::-1, :]
    if matched_parts:
        k = out.shape[-1]
        perm = list(range(k))
        for a, b in matched_parts:
            perm[a], perm[b] = perm[b], perm[a]
        out = out[..., jnp.asarray(perm)]
    return out


def shift_heatmap(heatmaps: jax.Array) -> jax.Array:
    """1-px right shift used after flip-back when TEST.SHIFT_HEATMAP is on
    (reference core/function.py:695-699 copies columns 0..W-2 into 1..W-1)."""
    return jnp.concatenate([heatmaps[:, :, :1, :], heatmaps[:, :, :-1, :]], axis=2)


def fliplr_joints(
    joints: jax.Array,
    joints_vis: jax.Array,
    width: int,
    matched_parts: Sequence[Tuple[int, int]] = (),
) -> tuple[jax.Array, jax.Array]:
    """Flip 2D joints horizontally: u -> width - u - 1, swap paired joints,
    zero invisible entries (reference transforms.py:33-47)."""
    joints = joints.at[..., 0].set(width - joints[..., 0] - 1.0)
    if matched_parts:
        k = joints.shape[-2]
        perm = list(range(k))
        for a, b in matched_parts:
            perm[a], perm[b] = perm[b], perm[a]
        perm = jnp.asarray(perm)
        joints = joints[..., perm, :]
        joints_vis = joints_vis[..., perm, :] if joints_vis.ndim == joints.ndim else joints_vis[..., perm]
    return joints * joints_vis, joints_vis
