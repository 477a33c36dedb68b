"""Train-mode BN statistics levers (models/layers.py set_bn_levers):
default-off parity, subsample semantics, and an end-to-end train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from hrnet_hand_pose_estimation_tpu.models.layers import (
    BN_EPS, BN_MOMENTUM, StatBatchNorm, bn_levers_active, set_bn_levers)


@pytest.fixture(autouse=True)
def _reset_levers():
    yield
    set_bn_levers()
    assert not bn_levers_active()


def _apply(mod, x):
    v = mod.init(jax.random.key(0), x)
    y, mut = mod.apply(v, x, mutable=["batch_stats"])
    return np.asarray(y, np.float32), jax.tree.map(np.asarray, mut["batch_stats"])


def test_stat_bn_matches_flax_default():
    """With no lever values set on the module, StatBatchNorm == flax
    nn.BatchNorm in train mode (same normalization and same EMA update)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, size=(8, 6, 6, 16)).astype(np.float32))
    y_ref, st_ref = _apply(
        nn.BatchNorm(use_running_average=False, momentum=BN_MOMENTUM,
                     epsilon=BN_EPS, dtype=jnp.float32,
                     param_dtype=jnp.float32), x)
    y_got, st_got = _apply(StatBatchNorm(dtype=jnp.float32), x)
    np.testing.assert_allclose(y_got, y_ref, atol=1e-5)
    np.testing.assert_allclose(st_got["mean"], st_ref["mean"], atol=1e-6)
    np.testing.assert_allclose(st_got["var"], st_ref["var"], atol=1e-5)


def test_stat_bn_subsample_uses_first_n():
    """stat_samples=n: normalization statistics come from x[:n] only."""
    rng = np.random.default_rng(1)
    x = np.concatenate([
        rng.normal(0.0, 1.0, size=(2, 4, 4, 8)),
        rng.normal(50.0, 9.0, size=(6, 4, 4, 8)),  # outlier tail samples
    ]).astype(np.float32)
    _, st = _apply(StatBatchNorm(dtype=jnp.float32, stat_samples=2),
                   jnp.asarray(x))
    head = x[:2].reshape(-1, 8)
    want_mean = (1 - BN_MOMENTUM) * head.mean(0)
    want_var = BN_MOMENTUM * 1.0 + (1 - BN_MOMENTUM) * head.var(0)
    np.testing.assert_allclose(st["mean"], want_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(st["var"], want_var, rtol=1e-3)


def test_stat_bn_bf16_accumulation_close():
    """stat_dtype='bfloat16' stays within bf16 rounding of the f32 stats."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0.5, 1.0, size=(16, 8, 8, 8)).astype(np.float32))
    y32, _ = _apply(StatBatchNorm(dtype=jnp.float32), x)
    y16, _ = _apply(StatBatchNorm(dtype=jnp.float32, stat_dtype="bfloat16"), x)
    assert np.abs(y16 - y32).max() < 0.05


def test_train_step_with_levers(tiny_cfg):
    """set_bn_levers(stat_samples=...) threads through ConvBN into a full
    train step: same param/stat trees, finite loss, stats updated."""
    import optax

    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
        TrainState, make_train_step)

    cfg = tiny_cfg
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32)),
        "pose2d": jnp.asarray(rng.uniform(2, 14, size=(8, 21, 2)).astype(np.float32)),
        "visibility": jnp.ones((8, 21), jnp.float32),
    }
    batch["target_heatmaps"] = gaussian_targets(
        batch["pose2d"], batch["visibility"], 16, 2)
    variables = model.init(jax.random.key(0), batch["images"][:1], False)
    tx = optax.adam(1e-3)

    set_bn_levers(stat_samples=2)
    try:
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]))
        step = make_train_step(cfg, model, tx)
        new_state, losses = step(state, batch)
    finally:
        set_bn_levers()
    assert np.isfinite(float(losses["total_loss"]))
    # the lever path produced real EMA updates with the standard tree
    stem_bn = new_state.batch_stats["backbone"]["stem1"]["bn"]
    assert set(stem_bn) == {"mean", "var"}
    assert float(np.abs(np.asarray(stem_bn["mean"])).max()) > 0.0


@pytest.mark.slow
def test_trainer_applies_config_bn_levers(tiny_cfg, tmp_path):
    """cfg.TPU.BN_STAT_SAMPLES/BN_STAT_DTYPE thread through the Trainer:
    the levers are active for the train-step trace and training runs."""
    from hrnet_hand_pose_estimation_tpu.core.trainer import Trainer
    from hrnet_hand_pose_estimation_tpu.data.build import make_dataloader
    from hrnet_hand_pose_estimation_tpu.models import build_model

    cfg = tiny_cfg.clone()
    cfg.DATASET.DATASET = ["Synthetic_kpt"]
    cfg.DATASET.TEST_DATASET = ["Synthetic_kpt"]
    cfg.TRAIN.IMAGES_PER_GPU = 16
    cfg.WORKERS = 0
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.LOG_DIR = str(tmp_path)
    cfg.TPU.BN_STAT_SAMPLES = 4
    cfg.TPU.BN_STAT_DTYPE = "bfloat16"
    cfg = cfg.freeze()

    loaders = make_dataloader(cfg, is_train=True, n_devices=1)
    tr = Trainer(cfg, build_model(cfg), loaders, output_dir=str(tmp_path))
    assert bn_levers_active()  # Trainer.__init__ armed the levers
    avgs = tr.train_epoch(epoch=1)
    assert avgs and np.isfinite(avgs["total_loss"])
