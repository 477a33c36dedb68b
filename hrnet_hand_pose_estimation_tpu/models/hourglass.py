"""Stacked hourglass filter bank (Flax, NHWC).

Re-design of reference lib/models/HourGlass.py:33-226 (HGFilter):
- pre-activation residual ConvBlock whose output concatenates three conv
  stages (out/2 + out/4 + out/4 channels), batch or group norm (:34-77)
- recursive HourGlass of the given depth with avg-pool down / bicubic
  align-corners up (:79-121); bicubic upsampling is replaced by the
  bilinear align-corners op (ops/upsample.py) — a documented divergence:
  XLA has no native bicubic and the 2x upsample difference is sub-pixel
- NUM_STACKS stacked glasses with intermediate supervision heads and skip
  re-injection (:157-221); per-stack outputs pass through tanh like the
  reference's ``use_sigmoid`` branch (which actually applies Tanh, :214)
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.upsample import upsample_bilinear_align_corners
from .layers import BN_EPS, BN_MOMENTUM

Dtype = Any


class HGNorm(nn.Module):
    norm: str = "batch"
    groups: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                epsilon=BN_EPS, dtype=x.dtype,
                                param_dtype=jnp.float32, name="norm")(x)
        return nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                            dtype=x.dtype, param_dtype=jnp.float32, name="norm")(x)


class HGConvBlock(nn.Module):
    """Pre-activation residual block with concat trunk (reference :34-77)."""

    out_planes: int
    norm: str = "batch"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        half, quarter = self.out_planes // 2, self.out_planes // 4
        residual = x
        y1 = nn.relu(HGNorm(self.norm, name="bn1")(x, train))
        y1 = nn.Conv(half, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(y1)
        y2 = nn.relu(HGNorm(self.norm, name="bn2")(y1, train))
        y2 = nn.Conv(quarter, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y2)
        y3 = nn.relu(HGNorm(self.norm, name="bn3")(y2, train))
        y3 = nn.Conv(quarter, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv3")(y3)
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        if x.shape[-1] != self.out_planes:
            residual = nn.relu(HGNorm(self.norm, name="bn4")(x, train))
            residual = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample")(residual)
        return out + residual


class HourGlass(nn.Module):
    """Recursive U-shaped module (reference :79-121)."""

    depth: int
    features: int
    norm: str = "batch"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def level(l, inp):
            up1 = HGConvBlock(self.features, self.norm, self.dtype,
                              name=f"b1_{l}")(inp, train)
            low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = HGConvBlock(self.features, self.norm, self.dtype,
                               name=f"b2_{l}")(low1, train)
            if l > 1:
                low2 = level(l - 1, low1)
            else:
                low2 = HGConvBlock(self.features, self.norm, self.dtype,
                                   name=f"b2_plus_{l}")(low1, train)
            low3 = HGConvBlock(self.features, self.norm, self.dtype,
                               name=f"b3_{l}")(low2, train)
            up2 = upsample_bilinear_align_corners(
                low3, (low3.shape[1] * 2, low3.shape[2] * 2))
            return up1 + up2

        return level(self.depth, x)


class HGFilter(nn.Module):
    """Stacked hourglass with intermediate supervision (reference :124-221)."""

    num_stacks: int = 2
    depth: int = 2
    num_joints: int = 21
    norm: str = "batch"
    down_type: str = "conv64"
    use_sigmoid: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[List[jax.Array], jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(HGNorm(self.norm, name="bn1")(x, train))

        if self.down_type == "conv64":
            x = HGConvBlock(64, self.norm, self.dtype, name="conv2")(x, train)
            x = nn.Conv(128, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="down_conv2")(x)
        elif self.down_type == "ave_pool":
            x = HGConvBlock(128, self.norm, self.dtype, name="conv2")(x, train)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        elif self.down_type == "no_down":
            x = HGConvBlock(128, self.norm, self.dtype, name="conv2")(x, train)
        else:
            raise ValueError(f"unknown down_type {self.down_type!r}")

        normx = x
        x = HGConvBlock(128, self.norm, self.dtype, name="conv3")(x, train)
        x = HGConvBlock(256, self.norm, self.dtype, name="conv4")(x, train)

        outputs = []
        previous = x
        for i in range(self.num_stacks):
            hg = HourGlass(self.depth, 256, self.norm, self.dtype,
                           name=f"m{i}")(previous, train)
            ll = HGConvBlock(256, self.norm, self.dtype, name=f"top_m_{i}")(hg, train)
            ll = nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"conv_last{i}")(ll)
            ll = nn.relu(HGNorm(self.norm, name=f"bn_end{i}")(ll, train))
            tmp_out = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32, name=f"l{i}")(ll)
            outputs.append(jnp.tanh(tmp_out).astype(jnp.float32)
                           if self.use_sigmoid else tmp_out.astype(jnp.float32))
            if i < self.num_stacks - 1:
                bl = nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"bl{i}")(ll)
                al = nn.Conv(256, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"al{i}")(tmp_out)
                previous = previous + bl + al
        return outputs, normx


def hourglass_from_cfg(cfg):
    extra = cfg.MODEL.EXTRA
    return HGFilter(
        num_stacks=int(extra.get("NUM_STACKS", 2)),
        depth=int(extra.get("DEPTH", 2)),
        num_joints=int(extra.get("LAST_CHANNELS", cfg.MODEL.NUM_JOINTS)),
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE) if "TPU" in cfg else jnp.bfloat16,
    )
