"""Model-specific 2D train steps: CPM and multi-view fusion.

The reference's train loop dispatches on MODEL.NAME inside train_helper
(lib/core/function.py:29-69: CPM centermaps :29-34, Aggr seq reshape
:35-54, transformer :55-66) and trains the 'MHP_mv' fusion model on raw
AND aggregated heatmaps jointly (:195-276).  Here each variant is its own
jitted step builder; ``pick_train_step`` routes by model name.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.decode import decode_heatmaps, spatial_softmax
from ..parallel.train_step import TrainState, apply_guarded_update, make_train_step
from .loss_computer import LossComputer2D
from . import losses as L


def make_train_step_cpm(cfg, model, tx) -> Callable:
    """CPM: image + centermap in; the LAST stage's 22-channel belief map is
    supervised against the 22-channel target, background channel included
    (reference function.py:29-34: heatmaps_pred = heatmap_lst[-1] vs the
    dataset's (K+1)-channel heatmaps with bg = 1 - max at channel 0)."""

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            beliefs = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], batch["centermaps"], True,
                mutable=["batch_stats"])
            beliefs, mutated = beliefs
            gt = batch["target_heatmaps"]
            pred = beliefs[-1]
            if gt.shape[-1] == pred.shape[-1] - 1:   # add bg channel on the fly
                gt = jnp.concatenate(
                    [1.0 - jnp.max(gt, axis=-1, keepdims=True), gt], axis=-1)
            total = L.heatmap_loss(pred, gt)
            return total, (mutated["batch_stats"], {"total_loss": total})

        grads, (stats, loss_dict) = jax.grad(loss_fn, has_aux=True)(state.params)
        return apply_guarded_update(cfg, tx, state, grads, stats, loss_dict)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_train_step_mv(cfg, model, tx) -> Callable:
    """MHP_mv fusion: raw + aggregated heatmaps both supervised
    (reference function.py:195-276)."""
    loss_computer = LossComputer2D(cfg)
    use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], True, mutable=["batch_stats"])
            b, v = batch["images"].shape[:2]
            hm_gt = batch["target_heatmaps"].reshape(b * v, *batch["target_heatmaps"].shape[2:])
            raw = out.raw_heatmaps.reshape(b * v, *out.raw_heatmaps.shape[2:])
            fused = out.fused_heatmaps.reshape(b * v, *out.fused_heatmaps.shape[2:])
            pose_gt = batch["pose2d"].reshape(b * v, -1, 2)
            vis = batch["visibility"].reshape(b * v, -1)
            pose_fused = decode_heatmaps(fused, use_softmax)
            t_raw, d_raw = loss_computer(
                heatmaps_pred=raw, heatmaps_gt=hm_gt,
                pose2d_pred=decode_heatmaps(raw, use_softmax),
                pose2d_gt=pose_gt, visibility=vis)
            t_fused, d_fused = loss_computer(
                heatmaps_pred=fused, heatmaps_gt=hm_gt,
                pose2d_pred=pose_fused, pose2d_gt=pose_gt, visibility=vis)
            total = t_raw + t_fused
            loss_dict = {"total_loss": total, "raw_loss": t_raw, "fused_loss": t_fused}
            return total, (mutated["batch_stats"], loss_dict)

        grads, (stats, loss_dict) = jax.grad(loss_fn, has_aux=True)(state.params)
        return apply_guarded_update(cfg, tx, state, grads, stats, loss_dict)

    return jax.jit(step_fn, donate_argnums=(0,))


def pick_train_step(cfg, model, tx, mesh=None) -> Callable:
    """Route by MODEL.NAME like the reference train_helper dispatch."""
    name = str(cfg.MODEL.NAME)
    if name == "CPM":
        return make_train_step_cpm(cfg, model, tx)
    if name == "multiview_pose_hrnet":
        return make_train_step_mv(cfg, model, tx)
    return make_train_step(cfg, model, tx, mesh)
