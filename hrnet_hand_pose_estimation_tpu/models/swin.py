"""Swin Transformer pose backbone (Flax, NHWC).

Re-design of reference lib/models/swin_transformer.py:72-837 (SwinPose):
patch embedding, window attention with relative position bias, shifted
windows via jnp.roll, patch merging between stages, and an upsampling pose
head emitting K heatmaps (+ optional spatial softmax like the HRNet heads).

TPU notes: window partitioning is pure reshape/transpose (no gathers);
attention is two einsums per block landing on the MXU; the roll for shifted
windows is a cheap HBM-local permute.  The reference's locality FFN
('le_ff', conv in the FFN) is supported via ``ff_type``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.decode import spatial_softmax
from .hrnet import HRNetOutput

Dtype = Any


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """Windowed MSA with relative position bias (reference :189-271)."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        nw, n, c = x.shape
        h = self.num_heads
        head_dim = self.dim // h
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nw, n, 3, h, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]                     # (nW, h, n, d)

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h))
        idx = jnp.asarray(relative_position_index(self.window_size)).reshape(-1)
        bias = bias_table[idx].reshape(n, n, h).transpose(2, 0, 1)

        attn = jnp.einsum("whnd,whmd->whnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (head_dim ** -0.5) + bias[None]
        if mask is not None:
            nm = mask.shape[0]
            attn = attn.reshape(nw // nm, nm, h, n, n) + mask[None, :, None]
            attn = attn.reshape(nw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    """W-MSA / SW-MSA block (reference :272-376)."""

    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0
    ff_type: str = "mlp"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y.astype(self.dtype), ws)

        mask = None
        if shift:
            img_mask = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)

        attn = WindowAttention(c, ws, self.num_heads, dtype=self.dtype,
                               name="attn")(windows, mask)
        y = window_reverse(attn, ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y

        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        hidden = int(c * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(z)
        z = nn.gelu(z)
        if self.ff_type == "le_ff":
            # locality-enhanced FFN: depthwise 3x3 between the dense layers
            z = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=hidden, dtype=self.dtype,
                        param_dtype=jnp.float32, name="dwconv")(z)
            z = nn.gelu(z)
        z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(z)
        return x + z


class SwinPose(nn.Module):
    """Patch embed + 4 stages + upsampling heatmap head (reference :569-837)."""

    num_joints: int = 21
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    ff_type: str = "mlp"
    heatmap_softmax: bool = True
    trainable_softmax: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> HRNetOutput:
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(dtype=jnp.float32, name="embed_norm")(x).astype(self.dtype)

        feats = []
        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for blk in range(depth):
                x = SwinBlock(dim, heads, self.window_size,
                              shift=0 if blk % 2 == 0 else self.window_size // 2,
                              ff_type=self.ff_type, dtype=self.dtype,
                              name=f"stage{s}_block{blk}")(x, train)
            feats.append(x)
            if s < len(self.depths) - 1:
                # patch merging (reference :377-400)
                b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
                x = nn.LayerNorm(dtype=jnp.float32, name=f"merge_norm{s}")(x)
                x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"merge{s}")(x.astype(self.dtype))
                dim *= 2

        # head: upsample stage-0-resolution features to heatmap size
        y = feats[0]
        y = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="final_conv")(y)
        logits = y
        if self.heatmap_softmax:
            temp = self.param("trainable_temp", nn.initializers.ones, ())
            if not self.trainable_softmax:
                temp = jax.lax.stop_gradient(temp)
            probs = spatial_softmax(logits, temp)
            return HRNetOutput(probs, feats[0], temp, None)
        return HRNetOutput(logits.astype(jnp.float32), feats[0], None, None)


def swin_from_cfg(cfg):
    return SwinPose(
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        patch_size=int(cfg.MODEL.PATCH_SIZE),
        embed_dim=int(cfg.MODEL.EMB_DIM[0]) if cfg.MODEL.EMB_DIM else 96,
        depths=tuple(int(d) for d in cfg.MODEL.DEPTHS),
        num_heads=tuple(int(h) for h in cfg.MODEL.NUM_HEADS),
        ff_type=str(cfg.MODEL.FF_TYPE),
        heatmap_softmax=bool(cfg.MODEL.HEATMAP_SOFTMAX),
        trainable_softmax=bool(cfg.MODEL.TRAINABLE_SOFTMAX),
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE) if "TPU" in cfg else jnp.bfloat16,
    )
