"""Temporal pose aggregation with deformable warping (PoseAggr).

Re-design of reference lib/models/pose_hrnet_PoseAggr.py:287-738: an HRNet
backbone embeds every frame; for each supporting frame, offset fields at 5
dilation rates (MODEL.DILATION_RATES, default.py:95) are predicted from the
concatenated (reference, support) features and drive deformable
convolutions (:616-638) that warp the support features onto the reference
frame; warped features fuse with the reference's and the head emits the
centre frame's heatmaps.

The reference requires its compiled CUDA extension (Linux-only guard,
tools/train.py:52-55); here the warp is the pure-XLA deformable conv
(ops/deform_conv.py) so the model runs anywhere JAX does.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import deform_conv2d
from ..ops.decode import spatial_softmax
from .hrnet import HRNetOutput, PoseHRNet

Dtype = Any


class DeformWarp(nn.Module):
    """Offset prediction (dilated) + deformable warp of support features."""

    channels: int
    dilation: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ref_feat: jax.Array, sup_feat: jax.Array) -> jax.Array:
        d = self.dilation
        both = jnp.concatenate([ref_feat, sup_feat], axis=-1)
        off = nn.Conv(2 * 9, (3, 3), padding=((d, d), (d, d)),
                      kernel_dilation=(d, d),
                      kernel_init=nn.initializers.zeros,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      name="offset_conv")(both.astype(jnp.float32))
        weight = self.param("deform_kernel", nn.initializers.normal(0.001),
                            (3, 3, sup_feat.shape[-1], self.channels))
        return deform_conv2d(sup_feat, off, weight, padding=1).astype(self.dtype)


class PoseAggrNet(nn.Module):
    """Centre-frame refinement from warped supporting frames."""

    backbone: PoseHRNet
    seq_len: int = 5
    num_joints: int = 21
    dilation_rates: Sequence[int] = (3, 6, 12, 18, 24)
    feat_channels: int = 64
    heatmap_softmax: bool = True
    trainable_softmax: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False) -> HRNetOutput:
        """frames: (B, T, H, W, 3); the centre frame T//2 is the reference."""
        b, t = frames.shape[:2]
        flat = frames.reshape(b * t, *frames.shape[2:])
        out = self.backbone(flat, train)
        feats = nn.Conv(self.feat_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduce")(out.features)
        feats = feats.reshape(b, t, *feats.shape[1:])
        center = t // 2
        ref = feats[:, center]

        warped_sum = ref
        count = 1.0
        for frame in range(t):
            if frame == center:
                continue
            sup = feats[:, frame]
            warped = None
            for d in self.dilation_rates:
                w = DeformWarp(self.feat_channels, d, dtype=self.dtype,
                               name=f"warp_f{frame}_d{d}")(ref, sup)
                warped = w if warped is None else warped + w
            warped_sum = warped_sum + warped / len(self.dilation_rates)
            count += 1.0
        fused = warped_sum / count

        logits = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(fused)
        if not self.heatmap_softmax:
            return HRNetOutput(logits.astype(jnp.float32), fused, None, None)
        temp = self.param("trainable_temp", nn.initializers.ones, ())
        if not self.trainable_softmax:
            temp = jax.lax.stop_gradient(temp)
        return HRNetOutput(spatial_softmax(logits, temp), fused, temp, None)
