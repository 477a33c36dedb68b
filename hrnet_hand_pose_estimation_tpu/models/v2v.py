"""V2V-PoseNet 3D hourglass over feature volumes (Flax, NDHWC).

Topology matches reference lib/models/v2v.py:7-180 (V2V-PoseNet): a 7^3-stem,
5-level max-pool encoder / transpose-conv decoder with residual skip paths,
and a 1^3 output conv.  Volumes flow as (B, X, Y, Z, C); XLA maps Conv3D onto
the MXU directly, so no custom kernels are needed — the win over the
reference is simply that the whole volumetric pipeline (unproject -> V2V ->
3D soft-argmax) fuses into one jitted program instead of a python loop
chain.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM

Dtype = Any


class Basic3D(nn.Module):
    """Conv3d + BN + ReLU (reference v2v.py:7-17)."""

    features: int
    kernel: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        pad = (k - 1) // 2
        x = nn.Conv(self.features, (k, k, k), padding=[(pad, pad)] * 3,
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, param_dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


class Res3D(nn.Module):
    """Two 3^3 convs + BN with (projected) skip (reference v2v.py:20-42)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        y = nn.Conv(self.features, (3, 3, 3), padding=[(1, 1)] * 3,
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3, 3), padding=[(1, 1)] * 3,
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = bn("bn2")(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1),
                        kernel_init=nn.initializers.xavier_normal(),
                        dtype=self.dtype, param_dtype=jnp.float32, name="skip_conv")(x)
            x = bn("skip_bn")(x)
        return nn.relu(y + x)


class Up3D(nn.Module):
    """ConvTranspose3d(k=2, s=2) + BN + ReLU (reference v2v.py:55-67)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             kernel_init=nn.initializers.xavier_normal(),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="deconv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, param_dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


def _pool3d(x):
    return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


class V2VModel(nn.Module):
    """Full V2V net: front -> 5-level encoder/decoder -> back -> 1^3 out conv
    (reference v2v.py:69-169)."""

    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # front (v2v.py:146-151)
        x = Basic3D(16, 7, dtype=self.dtype, name="front1")(x, train)
        x = Res3D(32, dtype=self.dtype, name="front2")(x, train)
        x = Res3D(32, dtype=self.dtype, name="front3")(x, train)
        x = Res3D(32, dtype=self.dtype, name="front4")(x, train)

        # encoder with skip branches (v2v.py:105-125)
        enc_ch = [64, 128, 128, 128, 128]
        skip_ch = [32, 64, 128, 128, 128]
        skips = []
        for i in range(5):
            skips.append(Res3D(skip_ch[i], dtype=self.dtype, name=f"skip{i+1}")(x, train))
            x = _pool3d(x)
            x = Res3D(enc_ch[i], dtype=self.dtype, name=f"enc{i+1}")(x, train)

        x = Res3D(128, dtype=self.dtype, name="mid")(x, train)

        # decoder (v2v.py:127-141)
        dec_ch = [128, 128, 128, 64, 32]
        res_ch = [128, 128, 128, 128, 64]
        for i in range(5):
            x = Res3D(res_ch[i], dtype=self.dtype, name=f"dec_res{5-i}")(x, train)
            x = Up3D(dec_ch[i], dtype=self.dtype, name=f"dec_up{5-i}")(x, train)
            x = x + skips[4 - i]

        # back + output (v2v.py:153-160)
        x = Res3D(32, dtype=self.dtype, name="back1")(x, train)
        x = Basic3D(32, 1, dtype=self.dtype, name="back2")(x, train)
        x = Basic3D(32, 1, dtype=self.dtype, name="back3")(x, train)
        x = nn.Conv(self.out_channels, (1, 1, 1),
                    kernel_init=nn.initializers.xavier_normal(),
                    dtype=self.dtype, param_dtype=jnp.float32, name="out")(x)
        return x.astype(jnp.float32)
