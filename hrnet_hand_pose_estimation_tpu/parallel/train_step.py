"""SPMD train/eval steps: one jitted program over the device mesh.

Replaces the reference's per-iteration python orchestration
(lib/core/function.py:24-162 train_helper + optimizer plumbing in
tools/train.py:271-318) with a functional, donated, fully-sharded step:

    state  = create_train_state(cfg, model, rng, sample_batch, mesh)
    step   = make_train_step(cfg, model, mesh)
    state, metrics = step(state, batch)     # compiled once, runs on mesh

Gradients, BatchNorm batch statistics and loss metrics are all global:
XLA inserts the cross-replica collectives from the sharding annotations
(the reference needed NCCL DDP + SyncBatchNorm + DistributedSampler for
the same semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.loss_computer import LossComputer2D
from ..ops.decode import decode_heatmaps
from .mesh import batch_sharding, param_shardings, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg, steps_per_epoch: int) -> optax.Schedule:
    """LR schedules matching the reference (tools/train.py:300-318):
    - 'multi_step': MultiStepLR over epochs LR_STEP with factor LR_FACTOR
    - 'warmup':     linear warmup over WARMUP_EPOCHS then constant
                    (lib/utils/utils.py:95-105)
    """
    base = float(cfg.TRAIN.LR)
    kind = str(cfg.TRAIN.LR_SCHEDULE)
    if kind == "multi_step":
        boundaries = {
            int(e) * steps_per_epoch: float(cfg.TRAIN.LR_FACTOR) for e in cfg.TRAIN.LR_STEP
        }
        return optax.piecewise_constant_schedule(base, boundaries)
    if kind in ("warmup", "warmup_linear"):
        warm = max(int(cfg.TRAIN.WARMUP_EPOCHS) * steps_per_epoch, 1)
        return lambda step: base * jnp.minimum((step + 1) / warm, 1.0)
    raise ValueError(f"unknown LR schedule {kind!r}")


def make_optimizer(cfg, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    """Optimizer factory (reference lib/utils/utils.py:71-92 get_optimizer)."""
    sched = make_lr_schedule(cfg, steps_per_epoch)
    name = str(cfg.TRAIN.OPTIMIZER).lower()
    if name == "adam":
        return optax.adam(sched)
    if name == "adamw":
        return optax.adamw(sched, weight_decay=float(cfg.TRAIN.WD))
    if name == "sgd":
        return optax.sgd(sched, momentum=float(cfg.TRAIN.MOMENTUM),
                         nesterov=bool(cfg.TRAIN.NESTEROV))
    raise ValueError(f"unknown optimizer {name!r}")


def create_train_state(cfg, model, rng, sample_batch, mesh=None,
                       steps_per_epoch: int = 1000) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialise parameters/optimizer, placing them on the mesh if given."""
    images = sample_batch["images"]
    if "centermaps" in sample_batch:   # CPM signature: (image, centermap, train)
        variables = jax.jit(model.init, static_argnums=(3,))(
            rng, images[:1], sample_batch["centermaps"][:1], False)
    else:
        variables = jax.jit(model.init, static_argnums=(2,))(rng, images[:1], False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=opt_state)
    if mesh is not None:
        shardings = state_shardings(mesh, state)
        state = jax.device_put(state, shardings)
    return state, tx


def state_shardings(mesh, state: TrainState):
    """Sharding pytree for TrainState: params via param_shardings (TP-aware),
    everything else replicated; optimizer moments follow their parameters.

    Optimizer-state subtrees that are structurally identical to the params
    tree (adam mu/nu, sgd momentum trace, ...) inherit the param shardings
    wholesale; every other leaf (step counters, scalars) is replicated.
    This is structural, not (shape, dtype)-keyed, so two different params
    with identical shapes can never alias each other's shardings.
    """
    p_sh = param_shardings(mesh, state.params)
    params_struct = jax.tree.structure(state.params)

    def _is_params_like(node) -> bool:
        try:
            return jax.tree.structure(node) == params_struct
        except Exception:
            return False

    opt_sh = jax.tree.map(
        lambda node: p_sh if _is_params_like(node)
        else jax.tree.map(lambda _: replicated(mesh), node),
        state.opt_state,
        is_leaf=_is_params_like,
    )

    return TrainState(
        step=replicated(mesh),
        params=p_sh,
        batch_stats=jax.tree.map(lambda _: replicated(mesh), state.batch_stats),
        opt_state=opt_sh,
    )


def apply_guarded_update(cfg, tx, state: TrainState, grads, new_stats,
                         loss_dict) -> Tuple[TrainState, Dict]:
    """Optimizer update with the TPU.DETECT_ANOMALY finite guard.

    Anomaly guard (the reference runs under set_detect_anomaly(True),
    tools/train.py:335, train3D.py:342): a non-finite gradient fully SKIPS
    the step — zero parameter delta, optimizer moments and BN running stats
    kept — and is surfaced as loss_dict['nonfinite_grads'].
    """
    detect = bool(cfg.TPU.DETECT_ANOMALY) if "TPU" in cfg else False
    if detect:
        # one fused finiteness probe: the f32 sum of each leaf is NaN/Inf
        # iff the leaf contains a non-finite value (inf pairs cancel to NaN),
        # and the tiny per-leaf sums fuse into the gradient producers —
        # measured 4.6 ms cheaper than 922 separate isfinite-all reduces
        probe = sum(jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree.leaves(grads))
        finite = jnp.isfinite(probe)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        # the poisoned batch must not leak into the running BN stats either
        new_stats = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_stats, state.batch_stats)
        loss_dict = dict(loss_dict)
        loss_dict["nonfinite_grads"] = 1.0 - finite.astype(jnp.float32)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    if detect:
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt, state.opt_state)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=new_params,
                      batch_stats=new_stats, opt_state=new_opt), loss_dict


def make_train_step(cfg, model, tx, mesh=None) -> Callable:
    """Build the jitted 2D train step.

    batch: {'images': (B,H,W,3), 'target_heatmaps': (B,h,w,K),
            'pose2d': (B,K,2) in heatmap px, 'visibility': (B,K)}
    """
    loss_computer = LossComputer2D(cfg)
    use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], True, mutable=["batch_stats"],
            )
            pose2d_pred = decode_heatmaps(out.heatmaps, use_softmax)
            total, loss_dict = loss_computer(
                heatmaps_pred=out.heatmaps,
                heatmaps_gt=batch.get("target_heatmaps"),
                pose2d_pred=pose2d_pred,
                pose2d_gt=batch.get("pose2d"),
                visibility=batch.get("visibility"),
            )
            if out.temperature is not None:
                loss_dict["temperature"] = out.temperature
            return total, (mutated["batch_stats"], loss_dict)

        grads, (new_stats, loss_dict) = jax.grad(loss_fn, has_aux=True)(state.params)
        return apply_guarded_update(cfg, tx, state, grads, new_stats, loss_dict)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    # shardings resolved lazily on first call (need the state/batch trees)
    compiled: Dict[str, Callable] = {}

    def sharded_step(state, batch):
        if "fn" not in compiled:
            st_sh = state_shardings(mesh, state)
            compiled["fn"] = jax.jit(
                step_fn,
                in_shardings=(st_sh, _batch_shardings(mesh, batch)),
                out_shardings=(st_sh, None),
                donate_argnums=(0,),
            )
        return compiled["fn"](state, batch)

    return sharded_step


def make_train_multistep(cfg, model, tx, mesh=None) -> Callable:
    """K train steps per dispatch: ``fn(state, batches) -> (state, losses)``.

    ``batches`` is a train-step batch dict whose every leaf carries a
    leading steps axis (K, B, ...); the K steps run in an on-device
    ``lax.scan`` (optimizer, BN stats and the anomaly guard included) and
    loss scalars come back stacked (K,).  One dispatch per K steps
    amortizes host/relay round-trips — the reference's DataPrefetcher
    (reference lib/dataset/build.py:8-40) exists for the same reason on
    CUDA streams; here the whole step loop is device-resident.  Used by
    the Trainer when ``cfg.TPU.STEPS_PER_DISPATCH > 1``.
    """
    loss_computer = LossComputer2D(cfg)
    use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)

    def step_fn(state, batch):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], True, mutable=["batch_stats"],
            )
            pose2d_pred = decode_heatmaps(out.heatmaps, use_softmax)
            total, loss_dict = loss_computer(
                heatmaps_pred=out.heatmaps,
                heatmaps_gt=batch.get("target_heatmaps"),
                pose2d_pred=pose2d_pred,
                pose2d_gt=batch.get("pose2d"),
                visibility=batch.get("visibility"),
            )
            if out.temperature is not None:
                loss_dict["temperature"] = out.temperature
            return total, (mutated["batch_stats"], loss_dict)

        grads, (new_stats, loss_dict) = jax.grad(loss_fn, has_aux=True)(state.params)
        return apply_guarded_update(cfg, tx, state, grads, new_stats, loss_dict)

    def multi_fn(state, batches):
        return jax.lax.scan(step_fn, state, batches)

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=(0,))

    compiled: Dict[str, Callable] = {}

    def sharded_multi(state, batches):
        if "fn" not in compiled:
            st_sh = state_shardings(mesh, state)
            # (K, B, ...) leaves: scan axis replicated, batch axis on 'data'
            b_sh = {k: NamedSharding(
                        mesh, P(*([None, "data"] + [None] * (v.ndim - 2))))
                    for k, v in batches.items()}
            compiled["fn"] = jax.jit(
                multi_fn,
                in_shardings=(st_sh, b_sh),
                out_shardings=(st_sh, None),
                donate_argnums=(0,),
            )
        return compiled["fn"](state, batches)

    return sharded_multi


def _batch_shardings(mesh, batch):
    """Batch-axis ('data') sharding for every array in a batch dict."""
    return {k: NamedSharding(mesh, P(*(["data"] + [None] * (v.ndim - 1))))
            for k, v in batch.items()}


def _sharded_eval(mesh, step_fn) -> Callable:
    """Shard eval batches over 'data' (state shardings resolved lazily)."""
    compiled: Dict[str, Callable] = {}

    def run(state, batch):
        if "fn" not in compiled:
            compiled["fn"] = jax.jit(
                step_fn,
                in_shardings=(state_shardings(mesh, state),
                              _batch_shardings(mesh, batch)),
            )
        return compiled["fn"](state, batch)

    return run


def make_eval_step(cfg, model, mesh=None) -> Callable:
    """Jitted eval step: forward (running BN stats), decode, optional
    flip-test TTA (reference core/function.py:681-701)."""
    from ..ops.flip import flip_back, shift_heatmap

    use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift = bool(cfg.TEST.SHIFT_HEATMAP)
    is_cpm = str(cfg.MODEL.NAME) == "CPM"

    def cpm_step_fn(state: TrainState, batch):
        # CPM validate: last stage's belief map, no flip TTA; decode the
        # joint channels, bg channel 0 excluded (reference function.py:639-644)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        beliefs = model.apply(variables, batch["images"], batch["centermaps"],
                              False)
        heatmaps = beliefs[-1][..., 1:]
        return {"heatmaps": heatmaps,
                "pose2d_pred": decode_heatmaps(heatmaps, use_softmax)}

    if is_cpm:
        return jax.jit(cpm_step_fn) if mesh is None else _sharded_eval(mesh, cpm_step_fn)

    def step_fn(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch["images"], False)
        heatmaps = out.heatmaps
        if flip_test:
            out_f = model.apply(variables, batch["images"][:, :, ::-1, :], False)
            hm_f = flip_back(out_f.heatmaps)
            if shift:
                hm_f = shift_heatmap(hm_f)
            heatmaps = 0.5 * (heatmaps + hm_f)
        pose2d_pred = decode_heatmaps(heatmaps, use_softmax)
        return {"heatmaps": heatmaps, "pose2d_pred": pose2d_pred}

    if mesh is None:
        return jax.jit(step_fn)
    return _sharded_eval(mesh, step_fn)


def make_forward_fn(cfg, model) -> Callable:
    """Plain jitted inference forward: images -> (heatmaps, pose2d)."""
    use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)

    @jax.jit
    def fwd(variables, images):
        out = model.apply(variables, images, False)
        return out.heatmaps, decode_heatmaps(out.heatmaps, use_softmax)

    return fwd
