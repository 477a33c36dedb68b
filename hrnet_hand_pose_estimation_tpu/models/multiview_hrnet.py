"""Cross-view fusion pose net ('MHP_mv' 2D path).

Re-design of reference lib/models/multiview_pose_hrnet.py:15-126:
- ChannelWiseFC: one dense (HW x HW) mixing per ordered view pair — an
  epipolar-free learned warp of heatmap planes
- Aggregation: for each target view, warp every other view with its pair's
  FC and fuse with fixed weights [0.4, 0.2, 0.2, 0.2]
- backbone frozen except stage4 + head (same recipe as the triangulation
  nets; handled by the trainer's optimizer labels)

All V*(V-1) pair FCs stack into one (P, HW, HW) parameter so the whole
aggregation is a single batched einsum instead of a python double loop.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .hrnet import PoseHRNet

Dtype = Any


class MultiViewOutput(NamedTuple):
    fused_heatmaps: jax.Array    # (B, V, h, w, K)
    raw_heatmaps: jax.Array      # (B, V, h, w, K)


class Aggregation(nn.Module):
    """Learned cross-view heatmap mixing (reference :32-72)."""

    n_views: int = 4
    hm_size: int = 64
    weights: Tuple[float, ...] = (0.4, 0.2, 0.2, 0.2)

    @nn.compact
    def __call__(self, heatmaps: jax.Array) -> jax.Array:
        """heatmaps: (B, V, h, w, K) -> fused (B, V, h, w, K)."""
        b, v, h, w, k = heatmaps.shape
        n_pairs = v * (v - 1)
        fc = self.param(
            "pair_fc", nn.initializers.lecun_normal(), (n_pairs, h * w, h * w))
        planes = heatmaps.astype(jnp.float32).transpose(0, 1, 4, 2, 3)
        planes = planes.reshape(b, v, k, h * w)

        # pair index layout matches the reference's enumeration order
        # (:59-68): for target i, sources are [i] + all j != i in order.
        outputs = []
        idx = 0
        for i in range(v):
            acc = planes[:, i] * self.weights[0]
            wi = 1
            for j in range(v):
                if j == i:
                    continue
                warped = jnp.einsum("bkn,nm->bkm", planes[:, j], fc[idx],
                                    precision=jax.lax.Precision.HIGHEST)
                acc = acc + warped * self.weights[wi]
                idx += 1
                wi += 1
            outputs.append(acc)
        fused = jnp.stack(outputs, axis=1).reshape(b, v, k, h, w)
        return fused.transpose(0, 1, 3, 4, 2)


class MultiViewPoseNet(nn.Module):
    """Backbone per view + aggregation (reference :74-126)."""

    backbone: PoseHRNet
    n_views: int = 4
    hm_size: int = 64
    aggre: bool = True

    @nn.compact
    def __call__(self, views: jax.Array, train: bool = False) -> MultiViewOutput:
        """views: (B, V, H, W, 3)."""
        b, v = views.shape[:2]
        flat = views.reshape(b * v, *views.shape[2:])
        out = self.backbone(flat, train)
        raw = out.heatmaps.reshape(b, v, *out.heatmaps.shape[1:])
        if not self.aggre:
            return MultiViewOutput(raw, raw)
        fused = Aggregation(self.n_views, self.hm_size, name="aggregation")(raw)
        return MultiViewOutput(fused, raw)
