"""Evaluation metrics: EPE / PCK / AUC accumulators + loss averaging.

Replicates the reference's evaluation protocol exactly:
- per-joint EPE = sum of visibility-masked L2 errors / per-joint visible
  count (tools/evaluate_2D.py:268-271,283)
- PCK@t counts ``error < t`` over all visible joints (:272-274), thresholds
  1..49 px for 2D and 1..50 mm for 3D (evaluate_3D.py)
- AUC is the trapezoid of the PCK curve (lib/utils/misc.py:288); the
  reference's plot slices the curve to its first 30 thresholds before
  integrating (misc.py:281), so `pck_auc` takes an explicit range.

Accumulators are plain jnp pytrees so they can live inside a jitted eval
step and merge across devices with a psum.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PoseMetricState(NamedTuple):
    """Running sums for EPE/PCK accumulation (2D or 3D)."""

    err_sum: jax.Array     # (K,) visibility-masked error sums
    vis_sum: jax.Array     # (K,) visible counts
    pck_sum: jax.Array     # (T,) counts of error < threshold over all joints

    @classmethod
    def create(cls, num_joints: int, thresholds: jax.Array) -> "PoseMetricState":
        return cls(
            err_sum=jnp.zeros((num_joints,), jnp.float32),
            vis_sum=jnp.zeros((num_joints,), jnp.float32),
            pck_sum=jnp.zeros((len(thresholds),), jnp.float32),
        )

    def update(self, pred: jax.Array, gt: jax.Array, visibility: jax.Array,
               thresholds: jax.Array) -> "PoseMetricState":
        """pred/gt: (B, K, D); visibility: (B, K)."""
        vis = visibility.astype(jnp.float32)
        err = jnp.linalg.norm(pred.astype(jnp.float32) - gt.astype(jnp.float32), axis=2) * vis
        pck = jnp.sum(
            (err[None, :, :] < thresholds[:, None, None]) * vis[None, :, :], axis=(1, 2)
        )
        return PoseMetricState(
            err_sum=self.err_sum + jnp.sum(err, axis=0),
            vis_sum=self.vis_sum + jnp.sum(vis, axis=0),
            pck_sum=self.pck_sum + pck,
        )

    def merge(self, other: "PoseMetricState") -> "PoseMetricState":
        return jax.tree.map(lambda a, b: a + b, self, other)

    # -- results ------------------------------------------------------------
    def epe_per_joint(self) -> np.ndarray:
        return np.asarray(self.err_sum) / np.maximum(np.asarray(self.vis_sum), 1e-12)

    def epe_mean(self) -> float:
        return float(self.epe_per_joint().mean())

    def pck_curve(self) -> np.ndarray:
        return np.asarray(self.pck_sum) / max(float(np.asarray(self.vis_sum).sum()), 1e-12)


def default_thresholds_2d() -> jnp.ndarray:
    """1..49 px (tools/evaluate_2D.py:167)."""
    return jnp.arange(1, 50, dtype=jnp.float32)


def default_thresholds_3d() -> jnp.ndarray:
    """1..50 mm (tools/evaluate_3D.py)."""
    return jnp.arange(1, 51, dtype=jnp.float32)


def pck_auc(pck: np.ndarray, thresholds: np.ndarray, start: int = 0, end: int | None = 30) -> float:
    """Trapezoid AUC of the PCK curve (reference misc.py:288).

    The reference slices to the first 30 thresholds before integrating
    (misc.py:281); pass ``end=None`` for the full curve.
    """
    pck = np.asarray(pck)[start:end]
    th = np.asarray(thresholds)[start:end]
    area = (pck[0] + 2.0 * pck[1:-1].sum() + pck[-1]) * (th[1] - th[0]) / 2.0
    return float(area / (th[-1] - th[0]))


def pck_at(pck: np.ndarray, thresholds: np.ndarray, value: float) -> float:
    """PCK at a given threshold (e.g. 20 px / 20 mm)."""
    idx = int(np.argmin(np.abs(np.asarray(thresholds) - value)))
    return float(np.asarray(pck)[idx])


class AverageMeter:
    """Running scalar averages for the training loop (reference
    core/function.py:1272-1316).  Host-side, tiny."""

    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def update(self, values: Dict[str, float], n: int = 1) -> None:
        for k, v in values.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v) * n
            self.counts[k] = self.counts.get(k, 0) + n

    def averages(self) -> Dict[str, float]:
        return {k: self.sums[k] / max(self.counts[k], 1) for k in self.sums}

    def reset(self) -> None:
        self.sums.clear()
        self.counts.clear()
