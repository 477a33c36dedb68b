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

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.BatchNorm2d(momentum=0.1) == flax momentum 0.9 (decay of the
# running average); eps matches torch's default 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# Experimental train-mode BN statistics levers (PERF.md round-4: attacking
# the measured 29.6 ms/step train-BN statistics cost at B=128).  Default off
# => the standard flax BatchNorm path, numerically unchanged.  Set via
# set_bn_levers() BEFORE tracing a train step; the values are Python-static
# under jit, so each setting compiles its own program.
_BN_LEVERS = {"stat_samples": 0, "stat_dtype": None}


def set_bn_levers(stat_samples: int = 0, stat_dtype: Optional[str] = None) -> None:
    """Configure train-mode BN statistics levers for subsequently traced
    models.  ``stat_samples=n`` computes batch statistics over only the
    first n samples (ghost-BN-style subsampling — cuts the stat-pass HBM
    reads by B/n; statistics become a noisier estimate of the batch,
    running averages follow the subsample).  ``stat_dtype='bfloat16'``
    accumulates the mean/var reductions in bf16 instead of f32."""
    _BN_LEVERS["stat_samples"] = int(stat_samples)
    _BN_LEVERS["stat_dtype"] = stat_dtype


def bn_levers_active() -> bool:
    return bool(_BN_LEVERS["stat_samples"] or _BN_LEVERS["stat_dtype"])


class StatBatchNorm(nn.Module):
    """Train-mode BatchNorm with the statistics levers above.

    Parameter ({scale, bias}) and batch_stats ({mean, var}) trees are
    identical to ``nn.BatchNorm``, so checkpoints are interchangeable; with
    ``stat_samples=0, stat_dtype=None`` the math matches flax (f32 biased
    variance over N,H,W; EMA decay = momentum).  Only instantiated when a
    lever is active — the default path stays literally nn.BatchNorm."""

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Dtype = jnp.bfloat16
    stat_samples: int = 0
    stat_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        xs = x[: self.stat_samples] if self.stat_samples else x
        sd = jnp.dtype(self.stat_dtype) if self.stat_dtype else jnp.float32
        xc = xs.astype(sd)
        axes = tuple(range(xs.ndim - 1))
        mean = jnp.mean(xc, axes)
        var = jnp.maximum(
            jnp.mean(jnp.square(xc), axes) - jnp.square(mean), 0.0)
        mean32 = mean.astype(jnp.float32)
        var32 = var.astype(jnp.float32)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean32)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var32)
        inv = jax.lax.rsqrt(var32 + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean32) * inv + bias
        return y.astype(self.dtype)


def batch_norm(train: bool, dtype: Dtype, name: str = "bn"):
    """The shared BN constructor: standard flax BatchNorm unless a
    statistics lever is active for a train-mode trace."""
    if train and bn_levers_active():
        return StatBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dtype,
            stat_samples=_BN_LEVERS["stat_samples"],
            stat_dtype=_BN_LEVERS["stat_dtype"], name=name)
    return nn.BatchNorm(
        use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
        dtype=dtype, param_dtype=jnp.float32, name=name)


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
        x = batch_norm(train, self.dtype)(x)
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
