"""Learnable multi-view triangulation networks (Flax).

Re-designs of reference lib/models/triangulation.py:
- AlgebraicTriangulationNet (:183-276): backbone 2D -> rescale to original
  image -> (confidence-weighted) DLT.
- RANSACTriangulationNet (:46-180): backbone 2D -> per-joint RANSAC DLT.
- VolumetricTriangulationNet (:277-470): backbone features -> 1x1 conv to 32ch
  -> per-sample cuboid centred on the triangulated middle-finger root ->
  unprojection -> V2V -> 3D soft-argmax over the coordinate volume.
- Discriminator (:20-44): MLP critic over [pose3d | KCS | TKCS] for the WGAN
  variant.

All python loops in the reference forwards (per-sample DLT, per-(batch,view)
grid_sample, per-joint SII) are replaced by the batched ops in ops/geometry
and ops/volumetric, so each net is one jittable program.  Multi-view inputs
fold views into the batch axis for the backbone — the TPU analog of the
reference's view-flattening (triangulation.py:358-359) — which also means a
('data',) mesh shards batch*views across chips for free.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.decode import decode_heatmaps
from ..ops.geometry import triangulate_batch, triangulate_eigh, triangulate_ransac
from ..ops.volumetric import (
    build_coord_volume,
    integrate_volumes_with_coordinates,
    rotate_coord_volume,
    unproject_heatmaps,
)
from .hrnet import PoseHRNet, StageCfg, hrnet_from_cfg
from .v2v import V2VModel

Dtype = Any


class Triangulation3DOutput(NamedTuple):
    """Common output bundle across the triangulation nets; mirrors the
    reference return tuples (keypoints_3d, keypoints_2d, heatmaps, ...)."""

    keypoints_3d: jax.Array                    # (B, K, 3)
    keypoints_2d: jax.Array                    # (B, V, K, 2)
    heatmaps: jax.Array                        # (B, V, h, w, K)
    confidences: Optional[jax.Array] = None    # (B, V, K) alg / (B, V, 32) vol
    volumes: Optional[jax.Array] = None        # (B, S, S, S, K)
    coord_volumes: Optional[jax.Array] = None  # (B, S, S, S, 3)
    base_points: Optional[jax.Array] = None    # (B, 3)


def _fold_views(images: jax.Array) -> Tuple[jax.Array, int, int]:
    b, v = images.shape[:2]
    return images.reshape(b * v, *images.shape[2:]), b, v


class AlgebraicTriangulationNet(nn.Module):
    """Backbone 2D detections + differentiable DLT (reference :183-276)."""

    backbone: PoseHRNet
    use_softmax: bool = True
    use_confidences: bool = False
    orig_img_size: Tuple[int, int] = (640, 480)   # (W, H), reference :217

    @nn.compact
    def __call__(self, images: jax.Array, proj_matrices: jax.Array,
                 train: bool = False) -> Triangulation3DOutput:
        flat, b, v = _fold_views(images)
        out = self.backbone(flat, train)
        hm = out.heatmaps                                    # (BV, h, w, K)
        k = hm.shape[-1]
        h = hm.shape[1]

        conf = None
        if self.use_confidences:
            conf = out.confidences.reshape(b, v, -1)          # (B, V, K)
            # normalise across views + eps (reference :233)
            conf = conf / jnp.sum(conf, axis=1, keepdims=True) + 1e-5

        kp2d = decode_heatmaps(hm, self.use_softmax).reshape(b, v, k, 2)
        # rescale heatmap coords to the original image (reference :244-247)
        w0, h0 = self.orig_img_size
        scale = jnp.asarray([w0 / h, h0 / h], jnp.float32)
        kp2d_full = kp2d * scale

        kp3d = triangulate_batch(kp2d_full, proj_matrices, method="eigh",
                                 confidences=conf)
        return Triangulation3DOutput(
            keypoints_3d=kp3d, keypoints_2d=kp2d_full,
            heatmaps=hm.reshape(b, v, *hm.shape[1:]), confidences=conf)


class RANSACTriangulationNet(nn.Module):
    """Backbone 2D detections + RANSAC triangulation (reference :46-180)."""

    backbone: PoseHRNet
    use_softmax: bool = True
    orig_img_size: Tuple[int, int] = (640, 480)
    reproj_eps: float = 40.0

    @nn.compact
    def __call__(self, images: jax.Array, proj_matrices: jax.Array,
                 train: bool = False) -> Triangulation3DOutput:
        flat, b, v = _fold_views(images)
        out = self.backbone(flat, train)
        hm = out.heatmaps
        k, h = hm.shape[-1], hm.shape[1]
        kp2d = decode_heatmaps(hm, self.use_softmax).reshape(b, v, k, 2)
        w0, h0 = self.orig_img_size
        kp2d_full = kp2d * jnp.asarray([w0 / h, h0 / h], jnp.float32)

        pts = jnp.swapaxes(kp2d_full, 1, 2)                  # (B, K, V, 2)
        prj = jnp.broadcast_to(proj_matrices[:, None], (b, k, v, 3, 4))
        kp3d, _ = triangulate_ransac(pts, prj, reproj_eps=self.reproj_eps)
        return Triangulation3DOutput(
            keypoints_3d=kp3d, keypoints_2d=kp2d_full,
            heatmaps=hm.reshape(b, v, *hm.shape[1:]))


class VolumetricTriangulationNet(nn.Module):
    """Volumetric triangulation (reference :277-470).

    Call with heatmap-scale projection matrices (K rescaled by the caller,
    mirroring function3D.py:88-93).  Training-time random y-axis rotation of
    the coordinate cube uses the flax 'aug' RNG stream.
    """

    backbone: PoseHRNet
    num_joints: int = 21
    volume_size: int = 64
    cuboid_size: float = 500.0
    aggregation: str = "softmax"
    volume_softmax: bool = True
    volume_multiplier: float = 1.0
    use_softmax_decode: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array, proj_matrices: jax.Array,
                 train: bool = False) -> Triangulation3DOutput:
        flat, b, v = _fold_views(images)
        out = self.backbone(flat, train)
        hm = out.heatmaps
        k, h = hm.shape[-1], hm.shape[1]

        vol_conf = None
        if out.confidences is not None:
            vol_conf = out.confidences.reshape(b, v, -1)
            if self.aggregation == "conf_norm":
                vol_conf = vol_conf / jnp.sum(vol_conf, axis=1, keepdims=True)

        # base point: DLT of the middle-finger root (joint 9) across views
        # (reference :369-370); heatmap-scale coordinates throughout
        kp2d = decode_heatmaps(hm, self.use_softmax_decode).reshape(b, v, k, 2)
        base = triangulate_eigh(
            jnp.swapaxes(kp2d[:, :, 9:10], 1, 2)[:, 0],       # (B, V, 2)
            proj_matrices,
        )                                                      # (B, 3)

        # coordinate cube around the base point + train-time random y-rotation
        # (reference :407-456)
        coord_volumes = build_coord_volume(base, self.cuboid_size, self.volume_size)
        if train:
            theta = jax.random.uniform(self.make_rng("aug"), (b,),
                                       minval=0.0, maxval=2.0 * jnp.pi)
        else:
            theta = jnp.zeros((b,))
        coord_volumes = rotate_coord_volume(coord_volumes, theta, (0, 1, 0),
                                            center=base)

        # 480ch features -> 32ch (reference :345-347) and unproject
        feats = nn.Conv(32, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name="process_features")(out.features.astype(self.dtype))
        feats = feats.reshape(b, v, *feats.shape[1:])
        volumes = unproject_heatmaps(feats, proj_matrices, coord_volumes,
                                     aggregation=self.aggregation,
                                     vol_confidences=vol_conf)

        volumes = V2VModel(self.num_joints, dtype=self.dtype,
                           name="volume_net")(volumes, train)
        kp3d, volumes = integrate_volumes_with_coordinates(
            volumes * self.volume_multiplier, coord_volumes,
            softmax=self.volume_softmax)

        return Triangulation3DOutput(
            keypoints_3d=kp3d, keypoints_2d=kp2d,
            heatmaps=hm.reshape(b, v, *hm.shape[1:]),
            confidences=vol_conf, volumes=volumes,
            coord_volumes=coord_volumes, base_points=base)


class Discriminator(nn.Module):
    """WGAN critic over [pose3d | KCS-Gram | temporal-KCS] features
    (reference triangulation.py:20-44): 3-layer MLP -> scalar score."""

    hidden: int = 100

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc2")(x))
        return nn.Dense(1, name="fc3")(x)


# ------------------------------------------------------------- builders
def build_triangulation_net(cfg, kind: Optional[str] = None):
    """Registry-style builder keyed like tools/train3D.py:152-158
    ({'ransac','alg','vol'} via MODEL.TRIANGULATION_MODEL_NAME)."""
    kind = kind or str(cfg.MODEL.TRIANGULATION_MODEL_NAME)
    uses_cpm = (kind == "vol_CPM"
                or str(cfg.MODEL.BACKBONE_NAME) == "CPM_volumetric")
    backbone = None
    if not uses_cpm:  # CPM-backed configs carry no HRNet stage specs
        backbone = hrnet_from_cfg(
            cfg, head="softmax",
            vol_confidences=bool(cfg.MODEL.VOL_CONFIDENCES) and kind == "vol",
            alg_confidences=bool(cfg.MODEL.ALG_CONFIDENCES) and kind == "alg",
        )
    use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)
    if kind == "alg":
        return AlgebraicTriangulationNet(
            backbone=backbone, use_softmax=use_softmax,
            use_confidences=bool(cfg.MODEL.ALG_CONFIDENCES))
    if kind == "ransac":
        return RANSACTriangulationNet(backbone=backbone, use_softmax=use_softmax)
    if kind in ("vol", "vol_CPM"):
        if uses_cpm:
            # CPM-backed volumetric variant (reference triangulation.py:472-654
            # VolumetricTriangulationNet_CPM)
            from .cpm import CPMVolumetric

            backbone = CPMVolumetric(num_joints=int(cfg.MODEL.NUM_JOINTS))
        return VolumetricTriangulationNet(
            backbone=backbone,
            num_joints=int(cfg.MODEL.NUM_JOINTS),
            volume_size=int(cfg.MODEL.VOLUME_SIZE),
            cuboid_size=float(cfg.MODEL.CUBOID_SIZE),
            aggregation=str(cfg.MODEL.VOLUME_AGGREGATION_METHOD),
            volume_softmax=bool(cfg.MODEL.VOLUME_SOFTMAX),
            volume_multiplier=float(cfg.MODEL.VOLUME_MULTIPLIER),
            use_softmax_decode=use_softmax,
        )
    raise ValueError(f"unknown triangulation model {kind!r}")
