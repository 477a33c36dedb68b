"""Config-driven loss assembly for the 2D and 3D train/eval steps.

Functional replacement for the reference's ``AverageMeter.computeLosses``
(lib/core/function.py:1319-1378): given model outputs and batch targets it
returns ``(total, {name: value})`` where the total applies the configured
``LOSS.*_FACTOR`` weights.  Pure jnp; lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import losses as L


class LossComputer2D:
    """2D losses: heatmap / pose2d / bone / jointangle (+OHKM option)."""

    def __init__(self, cfg):
        lc = cfg.LOSS
        self.with_heatmap = bool(lc.WITH_HEATMAP_LOSS)
        self.with_pose2d = bool(lc.WITH_POSE2D_LOSS)
        self.with_bone = bool(lc.WITH_BONE_LOSS)
        self.with_jointangle = bool(lc.WITH_JOINTANGLE_LOSS)
        self.use_ohkm = bool(lc.USE_OHKM)
        self.topk = int(lc.TOPK)
        self.f_heatmap = float(lc.HEATMAP_LOSS_FACTOR)
        self.f_pose2d = float(lc.POSE2D_LOSS_FACTOR)
        self.f_bone = float(lc.BONE_LOSS_FACTOR)
        self.f_jointangle = float(lc.JOINTANGLE_LOSS_FACTOR)

    def __call__(
        self,
        heatmaps_pred: Optional[jax.Array] = None,
        heatmaps_gt: Optional[jax.Array] = None,
        pose2d_pred: Optional[jax.Array] = None,
        pose2d_gt: Optional[jax.Array] = None,
        visibility: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        total = jnp.zeros((), jnp.float32)
        out: Dict[str, jax.Array] = {}

        if self.with_heatmap:
            if self.use_ohkm:
                hl = L.joints_ohkm_mse_loss(heatmaps_pred, heatmaps_gt,
                                            visibility, topk=self.topk)
            else:
                hl = L.heatmap_loss(heatmaps_pred, heatmaps_gt)
            out["heatmap_loss"] = hl
            total = total + self.f_heatmap * hl

        if self.with_pose2d:
            pl = L.joints_mse_loss(pose2d_pred[..., 0:2], pose2d_gt[..., 0:2], visibility)
            out["pose2d_loss"] = pl
            total = total + self.f_pose2d * pl

        if self.with_bone or self.with_jointangle:
            # wrist-centred, middle-finger-normalised poses (reference
            # function.py:1352-1373 via scale_pose2d)
            rel_pred = L.scale_pose(pose2d_pred[..., 0:2])
            rel_gt = L.scale_pose(pose2d_gt[..., 0:2])
            if self.with_bone:
                bl = L.bone_length_loss(rel_pred, rel_gt)
                out["bone_loss"] = bl
                total = total + self.f_bone * bl
            if self.with_jointangle:
                jl = L.joint_angle_loss(rel_pred)
                out["jointangle_loss"] = jl
                total = total + self.f_jointangle * jl

        out["total_loss"] = total
        return total, out


class LossComputer3D:
    """3D losses: pose3d MSE + volumetric CE + KCS (+2D terms), mirroring
    the dispatch in reference function3D.py:159-198."""

    def __init__(self, cfg):
        lc = cfg.LOSS
        self.loss2d = LossComputer2D(cfg)
        self.with_pose3d = bool(lc.WITH_POSE3D_LOSS)
        self.with_vce = bool(lc.WITH_VOLUMETRIC_CE_LOSS)
        self.with_kcs = bool(lc.WITH_KCS_LOSS)
        self.f_pose3d = float(lc.POSE3D_LOSS_FACTOR)
        self.f_vce = float(lc.VOLUMETRIC_LOSS_FACTOR)
        self.f_kcs = float(lc.KCS_LOSS_FACTOR)

    def __call__(
        self,
        pose3d_pred: Optional[jax.Array] = None,
        pose3d_gt: Optional[jax.Array] = None,
        coord_volumes: Optional[jax.Array] = None,
        volumes_pred: Optional[jax.Array] = None,
        validity: Optional[jax.Array] = None,
        **loss2d_kwargs,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        total, out = self.loss2d(**loss2d_kwargs) if loss2d_kwargs else (jnp.zeros((), jnp.float32), {})

        if self.with_pose3d and pose3d_pred is not None:
            p3 = L.joints_3d_mse_loss(pose3d_pred, pose3d_gt)
            out["pose3d_loss"] = p3
            total = total + self.f_pose3d * p3

        if self.with_vce and volumes_pred is not None:
            v = L.volumetric_ce_loss(coord_volumes, volumes_pred, pose3d_gt, validity)
            out["volumetric_ce_loss"] = v
            total = total + self.f_vce * v

        if self.with_kcs and pose3d_pred is not None:
            k = L.kcs_loss(pose3d_pred, pose3d_gt)
            out["kcs_loss"] = k
            total = total + self.f_kcs * k

        out["total_loss"] = total
        return total, out
