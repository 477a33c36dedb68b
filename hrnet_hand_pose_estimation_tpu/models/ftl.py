"""Feature-Transform-Layer multiview net (Flax).

Re-design of reference lib/models/FTL_encoder_decoder.py:83-213: a frozen
HRNet encoder feeds 480ch features; an encoder head compresses to 240ch
18x18 maps whose channels reshape to homogeneous image coords (..., 3);
each view's features transform to a canonical world frame via K^-1, R^-1, t
(the FTL), views fuse with 1x1 convs, redistribute per view, and a
transpose-conv decoder emits 64x64 softmax heatmaps; 3D comes from SII-DLT
over the decoded 2D predictions.

The per-view python loops of the reference collapse into batched einsums
over the view axis.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import decode_heatmaps, spatial_softmax
from ..ops.geometry import compose_projection, triangulate_sii
from .hrnet import PoseHRNet
from .layers import BN_EPS, BN_MOMENTUM
from .triangulation import Triangulation3DOutput, _fold_views

Dtype = Any


def conv_transpose_torch(x: jax.Array, features: int, kernel: int, stride: int,
                         padding: int, output_padding: int, name_scope, dtype):
    """ConvTranspose2d with torch's output-size arithmetic:
    out = (in-1)*stride - 2*padding + kernel + output_padding."""
    conv = nn.ConvTranspose(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(kernel - 1 - padding, kernel - 1 - padding + output_padding)] * 2,
        dtype=dtype, param_dtype=jnp.float32, name=name_scope)
    return conv(x)


class ConvBlock(nn.Module):
    """conv(+BN+ReLU) stack used by the reference's conv_block helper."""

    channels: Tuple[int, ...]
    kernels: Tuple[int, ...]
    strides: Tuple[int, ...]
    paddings: Tuple[int, ...]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, k, s, p) in enumerate(zip(self.channels, self.kernels,
                                             self.strides, self.paddings)):
            x = nn.Conv(c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class FTLMultiviewNet(nn.Module):
    backbone: PoseHRNet
    num_joints: int = 21
    num_views: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array, extrinsics: jax.Array,
                 intrinsics: jax.Array, train: bool = False) -> Triangulation3DOutput:
        """images (B, V, H, W, 3); extrinsics (B, V, 3, 4); intrinsics (B, 3, 3)."""
        flat, b, v = _fold_views(images)
        backbone_out = self.backbone(flat, train)
        feats = jax.lax.stop_gradient(backbone_out.features)  # frozen encoder (:106-107)

        # encoder head: 2x stride-2 conv -> (BV, 18, 18, 240) (:111-114)
        feats = ConvBlock((480, 240), (3, 3), (2, 2), (2, 2),
                          dtype=self.dtype, name="encoder_head")(feats, train)
        hw = feats.shape[1]
        assert (hw * hw) % 3 == 0, "spatial plane must split into homogeneous triplets"
        # spatial positions group into homogeneous triplets, channel-major
        # (reference :117: view(b, v, 240, -1, 3) on NCHW maps)
        f = feats.astype(jnp.float32).reshape(b, v, hw * hw, 240)
        f = f.transpose(0, 1, 3, 2).reshape(b, v, 240 * (hw * hw // 3), 3)

        K = intrinsics.astype(jnp.float32)                             # (B, 3, 3)
        R = extrinsics[..., :3].astype(jnp.float32)                    # (B, V, 3, 3)
        t = extrinsics[..., 3].astype(jnp.float32)                     # (B, V, 3)

        # FTL to canonical frame: x_world = R^-1 (K^-1 x - t) (:121-127)
        Kinv = jnp.linalg.inv(K)
        cam = jnp.einsum("bij,bvnj->bvni", Kinv, f)
        world = jnp.einsum("bvij,bvnj->bvni", jnp.linalg.inv(R), cam - t[:, :, None, :])

        def triplets_to_nhwc(x):
            # (B, [V,] 240*(hw*hw//3), 3) -> (..., hw, hw, 240), inverse of the
            # channel-major triplet packing above
            lead = x.shape[:-2]
            y = x.reshape(*lead, 240, hw * hw).swapaxes(-1, -2)
            return y.reshape(*lead, hw, hw, 240)

        # fuse views with 1x1 convs (:130-136)
        fused_in = triplets_to_nhwc(world)                       # (B, V, hw, hw, 240)
        fused_in = fused_in.transpose(0, 2, 3, 1, 4).reshape(b, hw, hw, v * 240)
        fused = ConvBlock((240, 240), (1, 1), (1, 1), (0, 0),
                          dtype=self.dtype, name="fuse_after_ftl")(fused_in, train)

        # redistribute per view: x_img = K (R x + t) (:139-144)
        g = fused.astype(jnp.float32).reshape(b, hw * hw, 240)
        g = g.swapaxes(1, 2).reshape(b, 1, 240 * (hw * hw // 3), 3)
        per_view = jnp.einsum("bvij,bvnj->bvni", R,
                              jnp.broadcast_to(g, (b, v, g.shape[2], 3)))
        per_view = per_view + t[:, :, None, :]
        per_view = jnp.einsum("bij,bvnj->bvni", K, per_view)
        per_view = triplets_to_nhwc(per_view).reshape(b * v, hw, hw, 240)

        # channel expansion + decoder (:147-160)
        x = ConvBlock((480,), (1,), (1,), (0,), dtype=self.dtype,
                      name="channel_expansion")(per_view, train)
        x = nn.relu(conv_transpose_torch(x, 256, 3, 2, 2, 0, "deconv1", self.dtype))
        x = nn.relu(conv_transpose_torch(x, 256, 3, 2, 2, 1, "deconv2", self.dtype))
        x = nn.relu(conv_transpose_torch(x, 256, 3, 1, 1, 0, "deconv3", self.dtype))
        logits = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="final_layer")(x)

        probs = spatial_softmax(logits)
        kp2d = decode_heatmaps(probs, True).reshape(b, v, self.num_joints, 2)
        proj = compose_projection(K[:, None], extrinsics)
        pts = jnp.swapaxes(kp2d, 1, 2)
        prj = jnp.broadcast_to(proj[:, None], (b, self.num_joints, v, 3, 4))
        kp3d = triangulate_sii(pts, prj)
        return Triangulation3DOutput(
            keypoints_3d=kp3d, keypoints_2d=kp2d,
            heatmaps=probs.reshape(b, v, *probs.shape[1:]))
