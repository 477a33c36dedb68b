"""SimpleBaseline: ResNet backbone + deconv head (Flax, NHWC).

Re-design of reference lib/models/pose_resnet.py:103-271 (upstream
SimpleBaseline): a torchvision-style ResNet feature extractor followed by
NUM_DECONV_LAYERS transpose convs and a final conv to K heatmaps.  The
reference's lib/models/ResNet.py feature extractor is subsumed by the same
backbone with ``num_deconv_layers=0``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, ConvBN, ResLayer

Dtype = Any

RESNET_SPECS = {
    18: ("BASIC", (2, 2, 2, 2)),
    34: ("BASIC", (3, 4, 6, 3)),
    50: ("BOTTLENECK", (3, 4, 6, 3)),
    101: ("BOTTLENECK", (3, 4, 23, 3)),
    152: ("BOTTLENECK", (3, 8, 36, 3)),
}


class ResNetBackbone(nn.Module):
    num_layers: int = 50
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers = RESNET_SPECS[self.num_layers]
        exp = 4 if block == "BOTTLENECK" else 1
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, param_dtype=jnp.float32,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = 64
        for i, (planes, n, stride) in enumerate(
                zip((64, 128, 256, 512), layers, (1, 2, 2, 2))):
            x = ResLayer(block, planes, n, in_ch, stride=stride,
                         dtype=self.dtype, name=f"layer{i+1}")(x, train)
            in_ch = planes * exp
        return x


class PoseResNet(nn.Module):
    """Backbone + deconv head -> heatmaps (reference pose_resnet.py:168-229)."""

    num_layers: int = 50
    num_joints: int = 21
    num_deconv_layers: int = 3
    deconv_filters: Tuple[int, ...] = (256, 256, 256)
    final_conv_kernel: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .hrnet import HRNetOutput

        feat = ResNetBackbone(self.num_layers, dtype=self.dtype, name="backbone")(x, train)
        y = feat
        for i in range(self.num_deconv_layers):
            # torch ConvTranspose2d(k=4, s=2, p=1): out = 2*in
            y = nn.ConvTranspose(self.deconv_filters[i], (4, 4), strides=(2, 2),
                                 padding=[(2, 2), (2, 2)], use_bias=False,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"deconv{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"deconv_bn{i}")(y)
            y = nn.relu(y)
        pad = 1 if self.final_conv_kernel == 3 else 0
        hm = nn.Conv(self.num_joints, (self.final_conv_kernel,) * 2,
                     padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                     param_dtype=jnp.float32, name="final_layer")(y)
        return HRNetOutput(hm.astype(jnp.float32), feat, None, None)


def pose_resnet_from_cfg(cfg):
    extra = cfg.MODEL.EXTRA
    return PoseResNet(
        num_layers=int(extra.get("NUM_LAYERS", 50)),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        num_deconv_layers=int(extra.get("NUM_DECONV_LAYERS", 3)),
        deconv_filters=tuple(extra.get("NUM_DECONV_FILTERS", [256, 256, 256])),
        final_conv_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE) if "TPU" in cfg else jnp.bfloat16,
    )
