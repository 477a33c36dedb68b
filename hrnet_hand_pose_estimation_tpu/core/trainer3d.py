"""3D multi-view training/validation engine.

Re-design of reference lib/core/function3D.py:18-513 + tools/train3D.py:
- model dispatch: 'alg'/'ransac' triangulate at original-image scale
  (pose2d_gt upscaled, P = K @ E, function3D.py:69-74); 'vol' rescales K to
  heatmap size first (:88-93)
- losses: pose3d MSE (+ scale factor), volumetric CE, optional 2D terms and
  KCS Gram-matrix terms (:159-198)
- layer freezing: backbone frozen except stage4 + head, with per-module
  learning rates for process_features / volume_net
  (triangulation.py:329-343, tools/train3D.py:190-197) — implemented as an
  optax.multi_transform over parameter path labels (the JAX way to freeze)
- single-view case recentres both poses on joint 9 (:122-132)

The whole step (backbone fwd over views, triangulation, V2V, losses, bwd,
optimizer) is ONE jitted program per step — the reference's python-looped
unprojection and per-sample DLT are already fused away in the model.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import device_prefetch
from ..ops.geometry import compose_projection, update_after_resize
from ..parallel.checkpoint import CheckpointManager
from ..parallel.mesh import make_mesh
from ..parallel.train_step import TrainState, make_lr_schedule
from ..utils.logging_utils import ScalarWriter, create_logger
from .loss_computer import LossComputer3D
from .metrics import AverageMeter


def freeze_labels(params, kind: str) -> Dict:
    """Label tree for optax.multi_transform.

    'frozen' for everything the reference freezes (backbone below stage4 and
    the softmax temperature, triangulation.py:329-343); 'main' for stage4 +
    head; 'process' / 'volume' for the volumetric modules.
    """

    def label(path: Tuple[str, ...]) -> str:
        top = path[0]
        if top == "process_features":
            return "process"
        if top == "volume_net":
            return "volume"
        if top == "backbone":
            joined = "/".join(path)
            if "stage4" in joined or "head_cb" in joined or "final_conv" in joined \
               or "confidence_head" in joined:
                return "main"
            return "frozen"
        if top == "trainable_temp":
            return "frozen"
        if top in ("head_cb", "final_conv", "confidence_head"):
            return "main"
        return "main"

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return label(path)

    return walk(params)


def make_optimizer_3d(cfg, params, steps_per_epoch: int = 1000):
    """Per-module-LR optimizer with frozen groups (tools/train3D.py:190-197)."""
    kind = str(cfg.MODEL.TRIANGULATION_MODEL_NAME)
    sched = make_lr_schedule(cfg, steps_per_epoch)

    tx = optax.multi_transform(
        {
            "main": optax.adam(sched),
            "process": optax.adam(lambda s: sched(s) * float(cfg.TRAIN.PROCESS_FEATURE_LR) / float(cfg.TRAIN.LR)),
            "volume": optax.adam(lambda s: sched(s) * float(cfg.TRAIN.VOLUME_NET_LR) / float(cfg.TRAIN.LR)),
            "frozen": optax.set_to_zero(),
        },
        freeze_labels(params, kind),
    )
    return tx


def build_projections(cfg, intrinsic: jax.Array, extrinsics: jax.Array,
                      orig_size: Tuple[int, int]) -> jax.Array:
    """P = K' @ E per view; K rescaled to heatmap size for the volumetric
    path (function3D.py:88-93), left at original scale for alg/ransac."""
    kind = str(cfg.MODEL.TRIANGULATION_MODEL_NAME)
    hm = int(cfg.MODEL.HEATMAP_SIZE[0])
    if "vol" in kind:
        k = update_after_resize(intrinsic, (orig_size[1], orig_size[0]), (hm, hm))
    else:
        k = intrinsic
    return compose_projection(k[:, None], extrinsics)


def make_train_step_3d(cfg, model, tx, orig_size: Tuple[int, int]):
    loss_computer = LossComputer3D(cfg)
    kind = str(cfg.MODEL.TRIANGULATION_MODEL_NAME)
    hm = float(cfg.MODEL.HEATMAP_SIZE[0])
    ow, oh = orig_size

    def step_fn(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        proj = build_projections(cfg, batch["intrinsic_matrix"],
                                 batch["extrinsic_matrices"], orig_size)
        pose2d_gt = batch["pose2d"]
        if kind in ("alg", "ransac"):
            # GT to original image scale (function3D.py:69-71)
            pose2d_gt = pose2d_gt * jnp.asarray([ow / hm, oh / hm], jnp.float32)

        vis = batch["visibility"]
        vis2d = vis[..., 0] if vis.ndim == 4 else vis

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], proj, True,
                rngs={"aug": rng}, mutable=["batch_stats"],
            )
            b, v = batch["images"].shape[:2]
            kwargs = dict(
                pose3d_pred=out.keypoints_3d,
                pose3d_gt=batch["pose3d"],
                validity=jnp.ones_like(batch["pose3d"][..., :1]),
            )
            if out.volumes is not None:
                kwargs["coord_volumes"] = out.coord_volumes
                kwargs["volumes_pred"] = out.volumes
            loss2d = {}
            if loss_computer.loss2d.with_pose2d:
                loss2d = dict(
                    pose2d_pred=out.keypoints_2d.reshape(-1, 21, 2),
                    pose2d_gt=pose2d_gt.reshape(-1, 21, 2),
                    visibility=vis2d.reshape(-1, 21),
                )
            if loss_computer.loss2d.with_heatmap and "heatmaps" in batch:
                loss2d["heatmaps_pred"] = out.heatmaps.reshape(-1, *out.heatmaps.shape[2:])
                loss2d["heatmaps_gt"] = batch["heatmaps"].reshape(-1, *batch["heatmaps"].shape[2:])
            total, loss_dict = loss_computer(**kwargs, **loss2d)
            return total, (mutated["batch_stats"], loss_dict)

        grads, (new_stats, loss_dict) = jax.grad(loss_fn, has_aux=True)(state.params)
        # same anomaly guard as the 2D step (reference train3D.py:342 also
        # runs under set_detect_anomaly(True))
        from ..parallel.train_step import apply_guarded_update

        return apply_guarded_update(cfg, tx, state, grads, new_stats, loss_dict)

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step_3d(cfg, model, orig_size: Tuple[int, int]):
    def step_fn(state: TrainState, batch):
        proj = build_projections(cfg, batch["intrinsic_matrix"],
                                 batch["extrinsic_matrices"], orig_size)
        out = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                          batch["images"], proj, False)
        return {"keypoints_3d": out.keypoints_3d, "keypoints_2d": out.keypoints_2d}

    return jax.jit(step_fn)


class Trainer3D:
    """Epoch orchestration for the 3D nets (tools/train3D.py:342-429)."""

    def __init__(self, cfg, model, train_loaders, val_loaders=None, mesh=None,
                 output_dir: Optional[str] = None):
        self.cfg = cfg
        self.model = model
        self.train_loaders = train_loaders
        self.val_loaders = val_loaders or {}
        self.mesh = mesh if mesh is not None else make_mesh(("data",))
        self.logger, default_out, tb_dir = create_logger(cfg, "train3d")
        self.output_dir = output_dir or default_out
        self.writer = ScalarWriter(tb_dir)
        self.ckpt = CheckpointManager(self.output_dir + "/checkpoints")
        self.rng = jax.random.key(int(cfg.TPU.SEED))

        loader = next(iter(train_loaders.values()))
        self.orig_size = tuple(getattr(loader.dataset, "orig_img_size", (640, 480)))
        sample = next(iter(loader))
        images = jnp.asarray(sample["imgs"][:1])
        proj = build_projections(
            cfg, jnp.asarray(sample["intrinsic_matrix"][:1]),
            jnp.asarray(sample["extrinsic_matrices"][:1]), self.orig_size)
        init_rngs = {"params": self.rng, "aug": jax.random.key(1)}
        variables = model.init(init_rngs, images, proj, False)
        steps_per_epoch = max(sum(len(l) for l in train_loaders.values()), 1)
        self.tx = make_optimizer_3d(cfg, variables["params"], steps_per_epoch)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
        )
        self.train_step = make_train_step_3d(cfg, model, self.tx, self.orig_size)
        self.eval_step = make_eval_step_3d(cfg, model, self.orig_size)
        self.begin_epoch = int(cfg.TRAIN.BEGIN_EPOCH)
        self.best_loss = float("inf")

        if cfg.AUTO_RESUME:
            restored = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored["state"]
                self.begin_epoch = int(restored["meta"]["epoch"]) + 1
                self.logger.info("AUTO_RESUME from epoch %d", self.begin_epoch)

    @staticmethod
    def _batch_for_step(batch) -> Dict:
        vis = batch["visibility"]
        return {
            "images": batch["imgs"],
            "pose2d": batch["pose2d"],
            "pose3d": batch["pose3d"],
            "visibility": vis,
            "extrinsic_matrices": batch["extrinsic_matrices"],
            "intrinsic_matrix": batch["intrinsic_matrix"],
            **({"heatmaps": batch["heatmaps"]} if "heatmaps" in batch else {}),
        }

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        meter = AverageMeter()
        t0 = time.time()
        n = 0
        for name, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            for i, batch in enumerate(device_prefetch(iter(loader), self.mesh)):
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, losses = self.train_step(
                    self.state, self._batch_for_step(batch), step_rng)
                n += batch["imgs"].shape[0]
                if i % int(self.cfg.PRINT_FREQ) == 0:
                    host = {k: float(v) for k, v in losses.items()}
                    meter.update(host, n=batch["imgs"].shape[0])
                    self.logger.info(
                        "Epoch[%d] %s[%d/%d] %.1f samples/s %s", epoch, name, i,
                        len(loader), n / max(time.time() - t0, 1e-9),
                        " ".join(f"{k}={v:.4f}" for k, v in host.items()))
        return meter.averages()

    def validate(self, epoch: int) -> Dict[str, float]:
        err_sum, count = 0.0, 0
        for name, loader in self.val_loaders.items():
            for batch in device_prefetch(iter(loader), self.mesh):
                out = self.eval_step(self.state, self._batch_for_step(batch))
                err = np.linalg.norm(
                    np.asarray(out["keypoints_3d"]) - np.asarray(batch["pose3d"]),
                    axis=2)
                err_sum += float(err.sum())
                count += err.size
        epe3d = err_sum / max(count, 1)
        self.logger.info("Validate3D[%d] EPE3D=%.3f mm", epoch, epe3d)
        self.writer.add_scalar("val/epe3d_mm", epe3d, epoch)
        return {"total_loss": epe3d, "epe3d_mm": epe3d}

    def fit(self) -> TrainState:
        for epoch in range(self.begin_epoch, int(self.cfg.TRAIN.END_EPOCH)):
            self.train_epoch(epoch)
            val = {} if self.cfg.WITHOUT_EVAL else self.validate(epoch)
            total = val.get("total_loss", float("inf"))
            if total < self.best_loss:
                self.best_loss = total
                self.ckpt.save_best(self.state)
            self.ckpt.save(epoch, self.state, extra={"best_loss": self.best_loss})
        self.writer.close()
        return self.state
