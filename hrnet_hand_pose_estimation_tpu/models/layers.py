"""Shared NHWC conv/norm building blocks for the model zoo.

Design notes (TPU-first):
- NHWC everywhere: XLA's TPU conv emitter prefers channels-last and keeps the
  MXU busy without layout transposes.
- 3x3 convs use explicit ((1,1),(1,1)) padding rather than 'SAME' so strided
  convs sample the same positions as the reference's torch ``padding=1``
  (torch pads symmetrically; XLA 'SAME' pads low/high asymmetrically for
  stride 2) — required for bit-comparable converted checkpoints.
- BatchNorm keeps fp32 statistics/params while activations flow in the
  configured compute dtype (bf16 by default).  Under a sharded-batch jit
  program the batch mean/var are global, so the reference's SyncBatchNorm
  (tools/train.py:227-228 and lib/models/hamburger/sync_bn) is subsumed by
  SPMD semantics with no extra machinery.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.BatchNorm2d(momentum=0.1) == flax momentum 0.9 (decay of the
# running average); eps matches torch's default 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def conv_init(std: float = 0.001):
    """normal(std=0.001) kernel init (reference pose_hrnet.py init_weights :570-600)."""
    return nn.initializers.normal(stddev=std)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, optionally ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=conv_init(),
            dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    """2x (3x3 conv+BN) residual block, expansion 1 (reference pose_hrnet.py:28-57)."""

    features: int
    stride: int = 1
    use_downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.features, 3, self.stride, relu=True, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype, name="cb2")(out, train)
        if self.use_downsample:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual block, expansion 4 (reference pose_hrnet.py:60-98)."""

    features: int
    stride: int = 1
    use_downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.features, 1, 1, relu=True, dtype=self.dtype, name="cb1")(x, train)
        out = ConvBN(self.features, 3, self.stride, relu=True, dtype=self.dtype, name="cb2")(out, train)
        out = ConvBN(self.features * 4, 1, 1, relu=False, dtype=self.dtype, name="cb3")(out, train)
        if self.use_downsample:
            residual = ConvBN(self.features * 4, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}
BLOCK_EXPANSION = {"BASIC": 1, "BOTTLENECK": 4}


class ResLayer(nn.Module):
    """Sequential stack of residual blocks (reference _make_layer :398-415)."""

    block: str
    features: int
    num_blocks: int
    in_features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BLOCKS[self.block]
        expansion = BLOCK_EXPANSION[self.block]
        needs_ds = self.stride != 1 or self.in_features != self.features * expansion
        x = block_cls(self.features, self.stride, needs_ds, dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.num_blocks):
            x = block_cls(self.features, 1, False, dtype=self.dtype, name=f"block{i}")(x, train)
        return x
