"""Convolutional Pose Machine (Flax, NHWC).

Re-design of reference lib/models/CPM.py:6-171: stage 1 is a 7-conv trunk;
stages 2..6 share a pooled feature trunk and refine the previous stage's
belief maps concatenated with a downsampled centre map.  Returns the list
of per-stage (K+1)-channel 32x32 belief maps like the reference (index 0 is
the background channel; callers slice ``[..., 1:]``).

The repeated stage blocks become two parameterised submodules; the loops in
the reference's forward are ordinary python over 6 static stages (fine for
XLA: unrolled once at trace time).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv(features: int, k: int, name: str, dtype):
    return nn.Conv(features, (k, k), padding=((k // 2, k // 2),) * 2,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _maxpool(x):
    # torch MaxPool2d(kernel=3, stride=2, padding=1)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class CPMTrunk(nn.Module):
    """3x (9^2 conv + maxpool) shared trunk (reference _middle, :83-89)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image):
        x = _maxpool(nn.relu(_conv(128, 9, "conv1", self.dtype)(image)))
        x = _maxpool(nn.relu(_conv(128, 9, "conv2", self.dtype)(x)))
        x = _maxpool(nn.relu(_conv(128, 9, "conv3", self.dtype)(x)))
        return x


class CPMRefine(nn.Module):
    """One refinement stage (reference _stage{2..6}, :91-135)."""

    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, trunk, prev_belief, center):
        x = nn.relu(_conv(32, 5, "conv_feat", self.dtype)(trunk))
        x = jnp.concatenate([x, prev_belief, center], axis=-1)
        x = nn.relu(_conv(128, 11, "mconv1", self.dtype)(x))
        x = nn.relu(_conv(128, 11, "mconv2", self.dtype)(x))
        x = nn.relu(_conv(128, 11, "mconv3", self.dtype)(x))
        x = nn.relu(_conv(128, 1, "mconv4", self.dtype)(x))
        return _conv(self.out_channels, 1, "mconv5", self.dtype)(x)


class CPMVolumetric(nn.Module):
    """CPM backbone for the volumetric triangulation net
    (reference lib/models/CPM_volumetric.py:44-226): the final stage's
    belief maps become softmax heatmaps and the refinement trunk features
    feed the unprojection.  Emits the HRNetOutput interface so
    VolumetricTriangulationNet is backbone-agnostic.

    The centre map (an input in the reference's dataset pipeline) defaults
    to a Gaussian at the image centre when not provided.
    """

    num_joints: int = 21
    center_sigma: float = 3.0   # reference MHP_CPMDataset.py:221
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False,
                 centermap: jax.Array | None = None):
        from ..ops.decode import spatial_softmax
        from ..ops.targets import gaussian_centermap
        from .hrnet import HRNetOutput

        b, h = image.shape[0], image.shape[1]
        if centermap is None:
            center = jnp.full((b, 2), (h - 1) / 2.0, jnp.float32)
            centermap = gaussian_centermap(center, h, self.center_sigma)
        beliefs = CPM(self.num_joints, dtype=self.dtype, name="cpm")(
            image, centermap, train)
        logits = beliefs[-1][..., 1:]                   # drop background ch
        probs = spatial_softmax(logits, 1.0)
        # trunk features for unprojection: recompute the shared trunk
        trunk = CPMTrunk(dtype=self.dtype, name="feat_trunk")(image.astype(self.dtype))
        return HRNetOutput(probs, trunk.astype(jnp.float32), None, None)


class CPM(nn.Module):
    """6-stage pose machine; forward(image, centermap) -> [stage maps]."""

    num_joints: int = 21
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image: jax.Array, centermap: jax.Array,
                 train: bool = False) -> List[jax.Array]:
        image = image.astype(self.dtype)
        k1 = self.num_joints + 1

        # centre map pooled to belief resolution (reference pool_center: avg 9/8/1)
        center = nn.avg_pool(centermap.astype(self.dtype), (9, 9), strides=(8, 8),
                             padding=((1, 1), (1, 1)))

        # stage 1 (reference _stage1, :71-81)
        x = _maxpool(nn.relu(_conv(128, 9, "s1_conv1", self.dtype)(image)))
        x = _maxpool(nn.relu(_conv(128, 9, "s1_conv2", self.dtype)(x)))
        x = _maxpool(nn.relu(_conv(128, 9, "s1_conv3", self.dtype)(x)))
        x = nn.relu(_conv(32, 5, "s1_conv4", self.dtype)(x))
        x = nn.relu(_conv(512, 9, "s1_conv5", self.dtype)(x))
        x = nn.relu(_conv(512, 1, "s1_conv6", self.dtype)(x))
        belief = _conv(k1, 1, "s1_conv7", self.dtype)(x)

        trunk = CPMTrunk(dtype=self.dtype, name="trunk")(image)

        beliefs = [belief.astype(jnp.float32)]
        for stage in range(2, 7):
            belief = CPMRefine(k1, dtype=self.dtype, name=f"stage{stage}")(
                trunk, belief, center)
            beliefs.append(belief.astype(jnp.float32))
        return beliefs
