"""CPM / multi-view train-step variants + trainer dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.core.train_variants import (
    make_train_step_cpm,
    make_train_step_mv,
    pick_train_step,
)
from hrnet_hand_pose_estimation_tpu.models.cpm import CPM
from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
from hrnet_hand_pose_estimation_tpu.models.multiview_hrnet import MultiViewPoseNet
from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets
from hrnet_hand_pose_estimation_tpu.parallel.train_step import TrainState, make_optimizer


def _state(model, tx, *init_args):
    variables = model.init(jax.random.key(0), *init_args)
    return TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]))


@pytest.mark.slow
def test_cpm_step(tiny_cfg):
    model = CPM(num_joints=21, dtype=jnp.float32)
    tx = make_optimizer(tiny_cfg, 10)
    img = jnp.zeros((2, 64, 64, 3))
    cm = jnp.zeros((2, 64, 64, 1))
    state = _state(model, tx, img, cm, False)
    step = make_train_step_cpm(tiny_cfg, model, tx)
    rng = np.random.default_rng(0)
    batch = {
        "images": img,
        "centermaps": cm,
        "target_heatmaps": gaussian_targets(
            jnp.asarray(rng.uniform(0, 8, (2, 21, 2)).astype(np.float32)),
            jnp.ones((2, 21)), 8, 1),
    }
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))
    state2, losses2 = step(state, batch)
    assert float(losses2["total_loss"]) != float(losses["total_loss"])  # learning


@pytest.mark.slow
def test_mv_step(tiny_cfg):
    cfg = tiny_cfg
    model = MultiViewPoseNet(
        backbone=hrnet_from_cfg(cfg, head="softmax", dtype=jnp.float32),
        n_views=2, hm_size=16)
    tx = make_optimizer(cfg, 10)
    views = jnp.zeros((1, 2, 64, 64, 3))
    state = _state(model, tx, views, False)
    step = make_train_step_mv(cfg, model, tx)
    rng = np.random.default_rng(0)
    joints = jnp.asarray(rng.uniform(2, 14, (1, 2, 21, 2)).astype(np.float32))
    batch = {
        "images": views,
        "pose2d": joints,
        "visibility": jnp.ones((1, 2, 21)),
        "target_heatmaps": gaussian_targets(
            joints.reshape(2, 21, 2), jnp.ones((2, 21)), 16, 2).reshape(1, 2, 16, 16, 21),
    }
    state, losses = step(state, batch)
    for k in ("total_loss", "raw_loss", "fused_loss"):
        assert np.isfinite(float(losses[k]))


def test_pick_dispatch(tiny_cfg):
    cfg = tiny_cfg.clone().defrost()
    cfg.MODEL.NAME = "CPM"
    cfg.freeze()
    model = CPM(num_joints=21)
    tx = make_optimizer(cfg, 10)
    fn = pick_train_step(cfg, model, tx)
    assert fn is not None


def test_eval_step_flip_tta(tiny_cfg, rng):
    """Flip-test TTA (reference function.py:681-701): averaged flipped
    forward changes predictions vs the plain path and stays in range."""
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import make_eval_step

    cfg_tta = tiny_cfg.clone().defrost()
    cfg_tta.TEST.FLIP_TEST = True
    cfg_tta.TEST.SHIFT_HEATMAP = True
    cfg_tta.freeze()

    model = build_model(tiny_cfg)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, False)
    variables = jax.tree.map(
        lambda a: jnp.asarray((rng.normal(size=a.shape) * 0.05).astype(np.float32))
        if a.ndim > 1 else
        jnp.asarray((np.abs(rng.normal(size=a.shape)) * 0.05 + 0.5).astype(np.float32)),
        variables)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=None)

    plain = make_eval_step(tiny_cfg, model)(state, {"images": x})
    tta = make_eval_step(cfg_tta, model)(state, {"images": x})
    assert tta["heatmaps"].shape == plain["heatmaps"].shape
    assert not np.allclose(np.asarray(tta["heatmaps"]),
                           np.asarray(plain["heatmaps"]))

    # TTA equals the manual composition 0.5*(f(x) + shift(flip_back(f(flip(x)))))
    from hrnet_hand_pose_estimation_tpu.ops.flip import flip_back, shift_heatmap

    def fwd(images):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, images, False).heatmaps

    manual = 0.5 * (fwd(x) + shift_heatmap(flip_back(fwd(x[:, :, ::-1, :]))))
    # jit vs eager f32 accumulation order differs slightly
    np.testing.assert_allclose(np.asarray(tta["heatmaps"]), np.asarray(manual),
                               atol=5e-5)


def test_checkpoint_roundtrip(tmp_path, tiny_cfg, rng):
    """Orbax save/restore preserves the full TrainState bit-exactly
    (reference AUTO_RESUME contract, tools/train.py:161-171)."""
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import CheckpointManager

    model = build_model(tiny_cfg)
    tx = make_optimizer(tiny_cfg, 10)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    state = _state(model, tx, x, False)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    ckpt.save(3, state, extra={"best_loss": 1.25, "train_global_steps": 42})
    assert ckpt.latest_epoch() == 3

    restored = ckpt.restore(jax.tree.map(jnp.zeros_like, state))
    assert int(restored["meta"]["epoch"]) == 3
    assert float(restored["meta"]["best_loss"]) == 1.25
    assert int(restored["meta"]["train_global_steps"]) == 42
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored["state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # best-model snapshot exists and loads
    ckpt.save_best(state)
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained

    best = load_pretrained(str(tmp_path / "ckpts" / "best"))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(best["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
