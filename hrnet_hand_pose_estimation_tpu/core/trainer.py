"""2D training/validation engine.

Re-design of reference lib/core/function.py:24-162 (train/train_helper),
:635-788 (validate/val_helper) and the epoch orchestration of
tools/train.py:335-405 — as one ``Trainer`` driving jitted SPMD steps:

- iterates the {name: loader} dict per dataset (multi-dataset joint
  training, reference function.py:183-193)
- per-PRINT_FREQ logging of loss averages + samples/s and TensorBoard
  scalars incl. the trainable softmax temperature (reference :111-162)
- validation with optional flip-test TTA (reference :681-701)
- checkpoint each epoch + best-model snapshot on lowest total validation
  loss (reference tools/train.py:363-405) and AUTO_RESUME

The per-batch python work is only queue management: batches prefetch to
device while the previous step runs, and every numeric path is inside the
jitted step.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import device_prefetch
from ..parallel.checkpoint import (CheckpointManager, load_pretrained,
                                    merge_pretrained)
from ..parallel.mesh import make_mesh
from ..parallel.train_step import (
    TrainState, create_train_state, make_eval_step, make_train_step,
)
from ..utils.logging_utils import ScalarWriter, create_logger
from .metrics import AverageMeter


def _batch_for_step(batch: Dict) -> Dict:
    """Select/rename the arrays the jitted step consumes."""
    out = {"images": batch["imgs"]}
    if "heatmaps" in batch:
        out["target_heatmaps"] = batch["heatmaps"]
    if "pose2d" in batch:
        out["pose2d"] = batch["pose2d"]
    if "centermaps" in batch:  # CPM path (reference function.py:29-34)
        out["centermaps"] = batch["centermaps"]
    if "visibility" in batch:
        vis = batch["visibility"]
        out["visibility"] = vis[..., 0] if vis.ndim == out["images"].ndim - 1 else vis
    return out


class Trainer:
    """End-to-end 2D trainer: epochs, logging, eval, checkpoints."""

    def __init__(self, cfg, model, train_loaders, val_loaders=None, mesh=None,
                 output_dir: Optional[str] = None):
        self.cfg = cfg
        self.model = model
        self.train_loaders = train_loaders
        self.val_loaders = val_loaders or {}
        self.mesh = mesh if mesh is not None else make_mesh(tuple(cfg.TPU.MESH_AXES),
                                                            tuple(cfg.TPU.MESH_SHAPE))
        self.logger, default_out, tb_dir = create_logger(cfg, "train")
        self.output_dir = output_dir or default_out
        self.writer = ScalarWriter(tb_dir)
        self.ckpt = CheckpointManager(self.output_dir + "/checkpoints")

        steps_per_epoch = max(sum(len(l) for l in train_loaders.values()), 1)
        sample = next(iter(next(iter(train_loaders.values()))))
        sample = _batch_for_step(sample)
        self.state, self.tx = create_train_state(
            cfg, model, jax.random.key(int(cfg.TPU.SEED)), sample, self.mesh,
            steps_per_epoch=steps_per_epoch)

        if cfg.MODEL.PRETRAINED and "hrnet" in str(cfg.MODEL.NAME).lower():
            # ImageNet(-style) trunk warm-start: partial, layer-filtered,
            # shape-checked (reference init_weights via MODEL.PRETRAINED,
            # pose_hrnet.py:560-585; layer filter MODEL.EXTRA.PRETRAINED_LAYERS)
            from ..utils.torch_convert import (
                convert_pretrained_trunk, load_torch_checkpoint)

            layers = tuple(cfg.MODEL.EXTRA.get("PRETRAINED_LAYERS", ["*"]))
            if cfg.MODEL.PRETRAINED.endswith((".pth", ".tar", ".pt")):
                pre = convert_pretrained_trunk(
                    load_torch_checkpoint(cfg.MODEL.PRETRAINED), layers)
                if pre.get("unmatched"):
                    self.logger.info(
                        "pretrained trunk: %d torch entries not in the pose "
                        "trunk (expected for classification checkpoints)",
                        len(pre["unmatched"]))
            else:
                pre = load_pretrained(cfg.MODEL.PRETRAINED)
            params, copied, _ = merge_pretrained(self.state.params,
                                                 pre.get("params", {}))
            stats, copied_s, _ = merge_pretrained(self.state.batch_stats,
                                                  pre.get("batch_stats", {}))
            self.state = self.state.replace(params=params, batch_stats=stats)
            self.logger.info(
                "warm-started %d param + %d stat leaves from %s",
                len(copied), len(copied_s), cfg.MODEL.PRETRAINED)

        if cfg.MODEL.HRNET_PRETRAINED:
            pre = load_pretrained(cfg.MODEL.HRNET_PRETRAINED)
            self.state = self.state.replace(
                params=pre["params"],
                batch_stats=pre.get("batch_stats", self.state.batch_stats))
            self.logger.info("loaded pretrained weights from %s",
                             cfg.MODEL.HRNET_PRETRAINED)

        from .train_variants import pick_train_step

        # train-mode BN statistics levers (trace-time static — must be set
        # before the train step's first trace; eval traces use running
        # stats and are unaffected).  Config default is off.
        if int(cfg.TPU.BN_STAT_SAMPLES) or str(cfg.TPU.BN_STAT_DTYPE):
            from ..models.layers import set_bn_levers

            set_bn_levers(int(cfg.TPU.BN_STAT_SAMPLES),
                          str(cfg.TPU.BN_STAT_DTYPE) or None)
            self.logger.info(
                "BN statistics levers active: stat_samples=%s stat_dtype=%s",
                cfg.TPU.BN_STAT_SAMPLES, cfg.TPU.BN_STAT_DTYPE or "f32")

        self.train_step = pick_train_step(cfg, model, self.tx, self.mesh)
        # device-resident multi-step: K train steps per dispatch (standard
        # 2D path only; CPM/mv variants keep per-step dispatch)
        self.steps_per_dispatch = (
            int(cfg.TPU.STEPS_PER_DISPATCH)
            if str(cfg.MODEL.NAME) not in ("CPM", "multiview_pose_hrnet")
            else 1)
        if self.steps_per_dispatch > 1:
            from ..parallel.train_step import make_train_multistep

            self.train_multistep = make_train_multistep(
                cfg, model, self.tx, self.mesh)
        else:
            self.train_multistep = None
        self.eval_step = make_eval_step(cfg, model, self.mesh)
        self.begin_epoch = int(cfg.TRAIN.BEGIN_EPOCH)
        self.best_loss = float("inf")
        self.train_global_steps = 0

        if cfg.AUTO_RESUME:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored["state"]
                meta = restored["meta"]
                self.begin_epoch = int(meta["epoch"]) + 1
                self.best_loss = float(meta.get("best_loss", np.inf))
                self.train_global_steps = int(meta.get("train_global_steps", 0))
                self.logger.info("AUTO_RESUME from epoch %d", self.begin_epoch)

    # ------------------------------------------------------------ epochs
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        meter = AverageMeter()
        t_start = time.time()
        n_samples = 0
        # epoch averages accumulate EVERY iteration (reference AverageMeter,
        # function.py:1272-1316) — but on device, so only PRINT_FREQ
        # iterations force a host sync
        accum: Optional[Dict] = None
        accum_n = 0
        k_dispatch = self.steps_per_dispatch
        pending: list = []
        # log every ~PRINT_FREQ optimizer steps (a pure `i % PRINT_FREQ`
        # check never fires under K-steps-per-dispatch when PRINT_FREQ is
        # not congruent with the dispatch boundary)
        print_freq = max(int(cfg.PRINT_FREQ), 1)
        last_log = self.train_global_steps - print_freq  # log the first iter
        for name, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            it = device_prefetch(iter(loader), self.mesh,
                                 depth=int(cfg.TPU.PREFETCH))
            for i, batch in enumerate(it):
                if getattr(loader.dataset, "exception", False):
                    continue  # reference skips flagged bad samples (function.py:188-190)
                step_batch = _batch_for_step(batch)
                if self.train_multistep is not None:
                    pending.append(step_batch)
                    if len(pending) < k_dispatch:
                        continue
                    stacked = jax.tree.map(
                        lambda *xs: jnp.stack(xs), *pending)
                    pending = []
                    self.state, losses_k = self.train_multistep(
                        self.state, stacked)
                    bs = step_batch["images"].shape[0]
                    n_samples += bs * k_dispatch
                    self.train_global_steps += k_dispatch
                    weighted = jax.tree.map(
                        lambda v: jnp.sum(v, axis=0) * bs, losses_k)
                    losses = jax.tree.map(lambda v: v[-1], losses_k)
                    accum = weighted if accum is None else jax.tree.map(
                        jnp.add, accum, weighted)
                    accum_n += bs * k_dispatch
                else:
                    self.state, losses = self.train_step(self.state, step_batch)
                    bs = step_batch["images"].shape[0]
                    n_samples += bs
                    self.train_global_steps += 1
                    weighted = jax.tree.map(lambda v: v * bs, losses)
                    accum = weighted if accum is None else jax.tree.map(
                        jnp.add, accum, weighted)
                    accum_n += bs
                if self.train_global_steps - last_log >= print_freq:
                    last_log = self.train_global_steps
                    host = {k: float(v) for k, v in losses.items()}
                    speed = n_samples / max(time.time() - t_start, 1e-9)
                    self.logger.info(
                        "Epoch[%d] %s[%d/%d] speed %.1f samples/s %s",
                        epoch, name, i, len(loader), speed,
                        " ".join(f"{k}={v:.5f}" for k, v in host.items()))
                    for k, v in host.items():
                        self.writer.add_scalar(f"train/{k}", v, self.train_global_steps)
        # leftover batches (< K at epoch end) run through the per-step path
        for step_batch in pending:
            self.state, losses = self.train_step(self.state, step_batch)
            bs = step_batch["images"].shape[0]
            n_samples += bs
            self.train_global_steps += 1
            weighted = jax.tree.map(lambda v: v * bs, losses)
            accum = weighted if accum is None else jax.tree.map(
                jnp.add, accum, weighted)
            accum_n += bs
        if accum is not None and accum_n:
            meter.update({k: float(v) / accum_n for k, v in accum.items()},
                         n=accum_n)
        return meter.averages()

    def validate(self, epoch: int) -> Dict[str, float]:
        from .loss_computer import LossComputer2D
        from ..ops.decode import decode_heatmaps

        loss_computer = LossComputer2D(self.cfg)
        meter = AverageMeter()
        debug_dumped = False
        for name, loader in self.val_loaders.items():
            it = device_prefetch(iter(loader), self.mesh, depth=2)
            for batch in it:
                step_batch = _batch_for_step(batch)
                out = self.eval_step(self.state, step_batch)
                if self.cfg.DEBUG.DEBUG and not debug_dumped:
                    # debug image grids (reference utils/vis.py:193-240 —
                    # the reference's call sites are commented out; here the
                    # first val batch per epoch is dumped under the run dir)
                    from ..utils.vis import save_debug_images

                    hm_scale = (step_batch["images"].shape[1]
                                / out["heatmaps"].shape[1])
                    save_debug_images(
                        self.cfg, step_batch["images"],
                        step_batch.get("pose2d") * hm_scale
                        if step_batch.get("pose2d") is not None else None,
                        out["pose2d_pred"] * hm_scale,
                        step_batch.get("target_heatmaps"), out["heatmaps"],
                        prefix=os.path.join(self.output_dir,
                                            f"debug_e{epoch}_{name}"))
                    debug_dumped = True
                hm_gt = step_batch.get("target_heatmaps")
                if (hm_gt is not None
                        and hm_gt.shape[-1] == out["heatmaps"].shape[-1] + 1):
                    hm_gt = hm_gt[..., 1:]   # drop the CPM background channel
                _, loss_dict = loss_computer(
                    heatmaps_pred=out["heatmaps"],
                    heatmaps_gt=hm_gt,
                    pose2d_pred=out["pose2d_pred"],
                    pose2d_gt=step_batch.get("pose2d"),
                    visibility=step_batch.get("visibility"),
                )
                meter.update({k: float(v) for k, v in loss_dict.items()},
                             n=step_batch["images"].shape[0])
        avgs = meter.averages()
        for k, v in avgs.items():
            self.writer.add_scalar(f"val/{k}", v, epoch)
        if avgs:
            self.logger.info("Validate[%d] %s", epoch,
                             " ".join(f"{k}={v:.5f}" for k, v in avgs.items()))
        return avgs

    def fit(self) -> TrainState:
        cfg = self.cfg
        for epoch in range(self.begin_epoch, int(cfg.TRAIN.END_EPOCH)):
            self.train_epoch(epoch)
            val = {} if cfg.WITHOUT_EVAL else self.validate(epoch)
            total = val.get("total_loss", float("inf"))
            if total < self.best_loss:
                self.best_loss = total
                self.ckpt.save_best(self.state)
                self.logger.info("new best model (val total %.5f)", total)
            self.ckpt.save(epoch, self.state, extra={
                "best_loss": self.best_loss,
                "train_global_steps": self.train_global_steps,
                "valid_global_steps": epoch,
            })
        self.writer.close()
        return self.state
