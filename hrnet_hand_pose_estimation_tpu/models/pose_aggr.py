"""Temporal pose aggregation with deformable warping (PoseAggr).

Faithful re-design of reference lib/models/pose_hrnet_PoseAggr.py:287-738:
the HRNet backbone emits per-frame heatmap LOGITS; offsets are predicted
from the DIFFERENCE between the centre frame's logits and every frame's
(:600-608) by a shared 20-BasicBlock chain (:367), then five dilated 3x3
offset heads (dilation rates MODEL.DILATION_RATES = 3/6/12/18/24, :373-377)
drive five per-joint-group deformable convolutions (:381-385,616-632) that
warp every frame toward the centre; the five warps average with weight 0.2
(:634) and the frames fuse with the reference's fixed temporal weights
0.3/0.25/0.25/0.1/0.1 (centre/±1/±2, :642); spatial softmax with the
trainable temperature finishes (:644-648).

The reference requires its compiled CUDA extension (Linux-only guard,
tools/train.py:52-55); here the warp is the pure-XLA grouped deformable
conv (ops/deform_conv.py, deformable_groups=num_joints) so the model runs
anywhere JAX does.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import spatial_softmax
from ..ops.deform_conv import deform_conv2d
from .hrnet import HRNetOutput, PoseHRNet
from .layers import ResLayer

Dtype = Any


class PoseAggrNet(nn.Module):
    """Centre-frame refinement from deformably warped frame heatmaps.

    ``backbone`` must emit heatmap logits (head='plain'); softmax happens
    after aggregation, as in the reference (:644-648).
    """

    backbone: PoseHRNet
    seq_len: int = 5
    num_joints: int = 21
    dilation_rates: Sequence[int] = (3, 6, 12, 18, 24)
    inner_channels: int = 128     # reference inner_ch (:364)
    offset_blocks: int = 20       # reference chain length (:367)
    heatmap_softmax: bool = True
    trainable_softmax: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False) -> HRNetOutput:
        """frames: (B, T, H, W, 3); the centre frame T//2 is the reference."""
        b, t = frames.shape[:2]
        k = self.num_joints
        flat = frames.reshape(b * t, *frames.shape[2:])
        out = self.backbone(flat, train)
        hm = out.heatmaps                       # (B*T, h, w, K) logits
        h, w = hm.shape[1:3]
        center = t // 2

        ref = hm.reshape(b, t, h, w, k)[:, center]
        # difference features vs the tiled centre frame (:600-605)
        diff = (jnp.repeat(ref, t, axis=0) - hm).astype(self.dtype)
        off_feats = ResLayer("BASIC", self.inner_channels, self.offset_blocks,
                             k, dtype=self.dtype, name="offset_feats")(diff, train)

        # five dilation-rate branches: offset head + grouped deform warp
        # (:373-385,616-632); offsets per joint group (deformable_groups=K)
        warped = None
        for i, d in enumerate(self.dilation_rates):
            off = nn.Conv(k * 2 * 9, (3, 3), padding=((d, d), (d, d)),
                          kernel_dilation=(d, d), use_bias=False,
                          kernel_init=nn.initializers.normal(0.001),
                          dtype=jnp.float32, param_dtype=jnp.float32,
                          name=f"offsets{i + 1}")(off_feats.astype(jnp.float32))
            weight = self.param(f"deform_kernel{i + 1}",
                                nn.initializers.normal(0.001), (3, 3, k, k))
            wi = deform_conv2d(hm, off, weight, padding=d, dilation=d,
                               deformable_groups=k)
            warped = wi if warped is None else warped + wi
        warped = (warped / len(self.dilation_rates)).reshape(b, t, h, w, k)

        # fixed temporal fusion weights (:636-642): centre 0.3, ±1 0.25, ±2 0.1
        if t == 5:
            weights = jnp.asarray([0.1, 0.25, 0.3, 0.25, 0.1])
        else:
            dist = jnp.abs(jnp.arange(t) - center)
            weights = jnp.where(dist == 0, 0.3,
                                jnp.where(dist == 1, 0.25, 0.1))
            weights = weights / jnp.sum(weights)
        fused = jnp.einsum("bthwk,t->bhwk", warped, weights)

        if not self.heatmap_softmax:
            return HRNetOutput(fused.astype(jnp.float32), fused, None, None)
        temp = self.param("trainable_temp", nn.initializers.ones, ())
        if not self.trainable_softmax:
            temp = jax.lax.stop_gradient(temp)
        return HRNetOutput(spatial_softmax(fused, temp), fused, temp, None)
