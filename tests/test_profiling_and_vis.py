"""Profiling helpers + debug-image-grid tests (VERDICT r1 #10).

The reference's observability is ad-hoc (SURVEY.md §5); ours is
utils/profiling.py (jax.profiler trace wrapper, samples/s meter, XLA cost
analysis) and utils/vis.py (reference-parity debug grids, vis.py:20-117,
193-240).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.utils.profiling import (
    Throughput, flops_of, trace)
from hrnet_hand_pose_estimation_tpu.utils.vis import (
    save_batch_heatmaps, save_batch_image_with_joints, save_debug_images)


def test_trace_captures_synthetic_train_step(tmp_path):
    """One saved trace from a (synthetic) jitted train step."""
    w = jnp.ones((32, 32))

    @jax.jit
    def step(w, x):
        y = jnp.tanh(x @ w)
        g = jax.grad(lambda w: jnp.sum(jnp.tanh(x @ w) ** 2))(w)
        return w - 0.01 * g, jnp.sum(y)

    x = jnp.ones((8, 32))
    step(w, x)  # compile outside the trace
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        w, loss = step(w, x)
        float(loss)
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files


def test_throughput_meter_warmup():
    th = Throughput(warmup_batches=2)
    assert th.samples_per_sec == 0.0
    for _ in range(5):
        th.update(16)
    assert th.samples_per_sec > 0
    # warmup batches excluded: only 3 post-warmup batches counted
    assert th.n_samples == 3 * 16


def test_flops_of_matmul():
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    f = flops_of(lambda a, b: a @ b, a, b)
    assert abs(f - 2 * 64 * 128 * 32) / (2 * 64 * 128 * 32) < 0.2


def test_debug_image_grids(tmp_path, rng):
    imgs = rng.normal(size=(4, 64, 64, 3)).astype(np.float32) * 0.5
    joints = rng.uniform(5, 59, size=(4, 21, 2)).astype(np.float32)
    hms = rng.uniform(0, 1, size=(4, 16, 16, 5)).astype(np.float32)

    p1 = str(tmp_path / "joints.jpg")
    save_batch_image_with_joints(imgs, joints, p1)
    assert os.path.getsize(p1) > 1000

    p2 = str(tmp_path / "hms.jpg")
    save_batch_heatmaps(imgs, hms, p2)
    assert os.path.getsize(p2) > 1000


def test_save_debug_images_gated_by_cfg(tmp_path, rng):
    """cfg.DEBUG.* gating matches the reference (vis.py:193-240)."""
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    joints = rng.uniform(2, 30, size=(2, 21, 2)).astype(np.float32)
    hms = rng.uniform(0, 1, size=(2, 8, 8, 21)).astype(np.float32)

    cfg = load_config(freeze=False)
    cfg.DEBUG.DEBUG = False
    cfg = cfg.freeze()
    save_debug_images(cfg, imgs, joints, joints, hms, hms,
                      prefix=str(tmp_path / "off"))
    assert not glob.glob(str(tmp_path / "off*"))

    cfg2 = load_config(freeze=False)
    cfg2.DEBUG.DEBUG = True
    cfg2.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg2.DEBUG.SAVE_BATCH_IMAGES_PRED = True
    cfg2.DEBUG.SAVE_HEATMAPS_GT = True
    cfg2.DEBUG.SAVE_HEATMAPS_PRED = True
    cfg2 = cfg2.freeze()
    save_debug_images(cfg2, imgs, joints, joints, hms, hms,
                      prefix=str(tmp_path / "on"))
    produced = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "on*")))
    assert produced == ["on_gt.jpg", "on_hm_gt.jpg", "on_hm_pred.jpg",
                       "on_pred.jpg"]
