"""Transformer pose models: temporal PoseFormer + RVT pooling transformer.

Re-designs of:
- lib/models/pose_hrnet_transformer.py:87-245 (PoseTransformer): per-frame
  HRNet 2D decodes -> spatial attention over joints -> temporal attention
  over frames -> weighted-mean head refining the centre frame's pose.
- lib/models/my_pose_transformer.py:190-370 (PoolingTransformer / RVT):
  ResNet features -> patch embed + keypoint tokens -> PiT-style stages with
  conv-head pooling.  NOTE: the reference's forward is unrunnable as
  shipped (interactive ``input()`` calls, shape mismatch in the head); this
  implementation completes its evident intent — keypoint tokens attend to
  image patches and a per-token head regresses (u, v) — and is documented
  as such rather than bug-compatible.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import decode_heatmaps
from .hrnet import PoseHRNet
from .pose_resnet import ResNetBackbone

Dtype = Any


class ViTBlock(nn.Module):
    """Pre-norm MSA + MLP block (the reference's timm-style Block)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, param_dtype=jnp.float32,
            name="attn")(y, y)
        x = x + y
        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(z)
        return x + z


class PoseTransformerOutput(NamedTuple):
    pose2d_refined: jax.Array   # (B, K, 2) centre-frame refined pose
    heatmaps: jax.Array         # (B*F, h, w, K) per-frame heatmaps
    temperature: Optional[jax.Array]


class PoseTransformer(nn.Module):
    """Temporal pose refinement (reference pose_hrnet_transformer.py:87-245)."""

    backbone: PoseHRNet
    num_frames: int = 5
    num_joints: int = 21
    embed_dim_ratio: int = 32
    depth: int = 4
    num_heads: int = 8
    use_softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False) -> PoseTransformerOutput:
        """frames: (B, F, H, W, 3)."""
        b, f = frames.shape[:2]
        k = self.num_joints
        flat = frames.reshape(b * f, *frames.shape[2:])
        out = self.backbone(flat, train)
        pose2d = decode_heatmaps(out.heatmaps, self.use_softmax)      # (BF, K, 2)

        # spatial attention over joints per frame (:196-209)
        d = self.embed_dim_ratio
        x = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                     name="spatial_embed")(pose2d)
        x = x + self.param("spatial_pos", nn.initializers.zeros, (1, k, d))
        for i in range(self.depth):
            x = ViTBlock(d, self.num_heads, dtype=self.dtype,
                         name=f"spatial_block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="spatial_norm")(x)
        x = x.reshape(b, f, k * d)

        # temporal attention over frames (:211-224)
        x = x + self.param("temporal_pos", nn.initializers.zeros, (1, self.num_frames, k * d))
        for i in range(self.depth):
            x = ViTBlock(k * d, self.num_heads, dtype=self.dtype,
                         name=f"temporal_block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="temporal_norm")(x)

        # weighted mean over frames (Conv1d(num_frames->1), :226)
        w = self.param("frame_weights", nn.initializers.normal(0.02),
                       (self.num_frames, 1))
        pooled = jnp.einsum("bfd,fo->bd", x, w)

        y = nn.LayerNorm(dtype=jnp.float32, name="head_norm")(pooled)
        y = nn.Dense(k * 2, dtype=self.dtype, param_dtype=jnp.float32,
                     name="head")(y)
        return PoseTransformerOutput(
            pose2d_refined=y.reshape(b, k, 2),
            heatmaps=out.heatmaps,
            temperature=out.temperature)


class ConvHeadPooling(nn.Module):
    """PiT stage pooling: depthwise stride-2 conv on the patch grid + dense
    on the keypoint tokens (reference conv_head_pooling)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jax.Array, tokens: jax.Array, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = patches.shape
        grid = patches.reshape(b, h, w, c)
        grid = nn.Conv(self.out_dim, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), feature_group_count=c,
                       dtype=self.dtype, param_dtype=jnp.float32, name="pool")(grid)
        tokens = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name="token_proj")(tokens)
        nh, nw = grid.shape[1:3]
        return grid.reshape(b, nh * nw, self.out_dim), tokens, (nh, nw)


class PoolingTransformer(nn.Module):
    """RVT: ResNet features + keypoint-token PiT (reference :190-370)."""

    num_joints: int = 21
    backbone_layers: int = 50
    patch_size: int = 2
    base_dims: Sequence[int] = (48, 48)
    depths: Sequence[int] = (2, 2)
    num_heads: Sequence[int] = (3, 6)
    heatmap_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, H, W, 3) -> (B, K, 2) poses in heatmap coordinates."""
        feats = ResNetBackbone(self.backbone_layers, dtype=self.dtype,
                               name="backbone")(x, train)       # (B, H/32, W/32, C)
        dim0 = self.base_dims[0] * self.num_heads[0]
        ps = min(self.patch_size, feats.shape[1])
        patches = nn.Conv(dim0, (ps, ps), strides=(ps, ps), dtype=self.dtype,
                          param_dtype=jnp.float32, name="patch_embed")(feats)
        b, h, w, _ = patches.shape
        seq = patches.reshape(b, h * w, dim0)

        tokens = self.param("keypoint_tokens", nn.initializers.uniform(1.0),
                            (self.num_joints, dim0))
        tokens = jnp.broadcast_to(tokens[None], (b, self.num_joints, dim0))

        hw = (h, w)
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.base_dims[stage] * heads
            cat = jnp.concatenate([tokens, seq], axis=1)
            for blk in range(depth):
                cat = ViTBlock(dim, heads, dtype=self.dtype,
                               name=f"stage{stage}_block{blk}")(cat)
            tokens, seq = cat[:, :self.num_joints], cat[:, self.num_joints:]
            if stage < len(self.depths) - 1:
                seq, tokens, hw = ConvHeadPooling(
                    self.base_dims[stage + 1] * self.num_heads[stage + 1],
                    dtype=self.dtype, name=f"pool{stage}")(seq, tokens, hw)

        tokens = nn.LayerNorm(dtype=jnp.float32, name="norm")(tokens)
        uv = nn.Dense(2, dtype=self.dtype, param_dtype=jnp.float32,
                      name="head")(tokens)
        # sigmoid into heatmap coordinate range
        return jax.nn.sigmoid(uv) * self.heatmap_size
