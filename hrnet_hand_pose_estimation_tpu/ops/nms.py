"""Box/keypoint NMS, vectorised for XLA.

Replaces the reference's native NMS stack (lib/nms/cpu_nms.pyx greedy IoU
NMS, nms_kernel.cu 64-box bitmask kernel, nms/nms.py:17-60 wrappers incl.
``soft_nms`` and the OKS-NMS used by COCO eval in lib/dataset/coco.py).

Greedy NMS is an inherently sequential scan; on TPU it becomes a
``lax.fori_loop`` over boxes (N is small — detection candidates per image)
operating on a precomputed IoU/OKS matrix, entirely on device: no Cython,
no custom CUDA, no host round trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def iou_matrix(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU for (N, 4) [x1, y1, x2, y2] boxes (+1 area convention of
    the reference cpu_nms.pyx)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1)
    h = jnp.maximum(0.0, yy2 - yy1 + 1)
    inter = w * h
    return inter / (area[:, None] + area[None, :] - inter)


def nms(dets: jax.Array, thresh: float) -> jax.Array:
    """Greedy IoU NMS (reference nms/nms.py:34-60 pure-python `nms`).

    dets: (N, 5) [x1, y1, x2, y2, score].  Returns a keep mask (N,) bool
    in score order semantics identical to the reference's index list.
    """
    scores = dets[:, 4]
    order = jnp.argsort(-scores)
    ious = iou_matrix(dets[:, :4])[order][:, order]
    n = dets.shape[0]

    def body(i, keep):
        # suppress j > i if kept i overlaps j
        suppress = (ious[i] > thresh) & keep[i]
        idx = jnp.arange(n)
        keep = jnp.where((idx > i) & suppress, False, keep)
        return keep

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def soft_nms(dets: jax.Array, sigma: float = 0.5, score_thresh: float = 0.001,
             method: str = "gaussian") -> jax.Array:
    """Soft-NMS (reference cpu_soft_nms): decay scores of overlapping boxes
    instead of removing them.  Returns rescored dets (N, 5)."""
    n = dets.shape[0]
    boxes = dets[:, :4]
    scores = dets[:, 4]
    ious = iou_matrix(boxes)

    def body(i, scores):
        # pick current max among remaining (score order emerges dynamically)
        m = jnp.argmax(scores)
        ov = ious[m]
        if method == "gaussian":
            decay = jnp.exp(-(ov * ov) / sigma)
        else:
            decay = jnp.where(ov > 0.3, 1.0 - ov, 1.0)
        decay = decay.at[m].set(1.0)
        # freeze the picked box by negating it; only decay still-live scores
        new = jnp.where(scores > 0, scores * decay, scores)
        return new.at[m].set(-scores[m])

    out = jax.lax.fori_loop(0, n, body, scores)
    final = jnp.where(out < 0, -out, out)
    final = jnp.where(final > score_thresh, final, 0.0)
    return jnp.concatenate([boxes, final[:, None]], axis=1)


# the 17 published COCO keypoint sigmas (reference nms/nms.py:77)
COCO_SIGMAS = (0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72,
               0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89)
COCO_SIGMAS = tuple(s / 10.0 for s in COCO_SIGMAS)


def oks_matrix(kpts: jax.Array, areas: jax.Array,
               sigmas: Optional[jax.Array] = None) -> jax.Array:
    """Pairwise object-keypoint similarity (COCO OKS; reference
    dataset/coco.py eval path).  kpts: (N, K, 3) [x, y, vis]."""
    k = kpts.shape[1]
    if sigmas is None:
        sigmas = (jnp.asarray(COCO_SIGMAS) if k == 17
                  else jnp.full((k,), 0.05))
    var = (2 * sigmas) ** 2
    dx = kpts[:, None, :, 0] - kpts[None, :, :, 0]
    dy = kpts[:, None, :, 1] - kpts[None, :, :, 1]
    e = (dx**2 + dy**2) / var[None, None] / (
        (areas[:, None, None] + areas[None, :, None]) / 2 + 1e-12) / 2.0
    vis = (kpts[:, :, 2] > 0).astype(jnp.float32)
    both = vis[:, None, :] * vis[None, :, :]
    return jnp.sum(jnp.exp(-e) * both, axis=-1) / jnp.maximum(jnp.sum(both, axis=-1), 1)


def oks_nms(kpts: jax.Array, scores: jax.Array, areas: jax.Array,
            thresh: float, sigmas: Optional[jax.Array] = None) -> jax.Array:
    """Greedy OKS-NMS keep mask (reference coco.py OKS-NMS via native nms)."""
    order = jnp.argsort(-scores)
    oks = oks_matrix(kpts, areas, sigmas)[order][:, order]
    n = kpts.shape[0]

    def body(i, keep):
        suppress = (oks[i] > thresh) & keep[i]
        idx = jnp.arange(n)
        return jnp.where((idx > i) & suppress, False, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)
