"""Measure the train-mode BN statistics levers on the real chip.

PERF.md round-3 named 29.6 ms/step of train-BN statistics cost at B=128
(fwd+bwd 128.8 ms train-BN vs 99.2 ms eval-BN) and stopped.  This times the
two implementable levers from models/layers.py:set_bn_levers against the
baseline, using the fwd+bwd+loss probe (the quantity whose train/eval-BN
delta defined the 29.6 ms):

  - baseline        : flax BatchNorm, f32 stats over the full batch
  - eval-BN         : running stats (the floor — no stat computation)
  - bf16 stats      : mean/var reductions accumulated in bf16
  - ghost-BN B/4,B/8: stats over the first 32 / 16 samples only

    python tools/perf_bn_levers.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("PERF_BATCH", "128"))
CHUNK = 4
DISPATCHES = 4


def timed_ms(fn, *args) -> float:
    r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(r).reshape(-1)[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(DISPATCHES):
        out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])
    total = time.perf_counter() - t0 - 0.03
    return total / (DISPATCHES * CHUNK) * 1e3


def main() -> None:
    from perf_train_profile import flagship_cfg  # tools/ on sys.path

    from hrnet_hand_pose_estimation_tpu.core.loss_computer import LossComputer2D
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.models.layers import set_bn_levers
    from hrnet_hand_pose_estimation_tpu.ops.decode import decode_heatmaps
    from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    cfg = flagship_cfg()
    model = build_model(cfg)
    loss_computer = LossComputer2D(cfg)
    rng = np.random.default_rng(0)
    bufs = jnp.asarray(rng.normal(
        size=(CHUNK, BATCH, 256, 256, 3)).astype(np.float32))
    joints = jnp.asarray(
        rng.uniform(4, 60, size=(BATCH, 21, 2)).astype(np.float32))
    vis = jnp.ones((BATCH, 21), jnp.float32)
    hm0 = gaussian_targets(joints, vis, 64, 2)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), bufs[0][:1], False)
    params, stats = variables["params"], variables["batch_stats"]
    print(f"init done (B={BATCH})", flush=True)

    def fwd_bwd_chunk(train: bool):
        # fresh jit per lever setting: set_bn_levers is trace-time static
        @jax.jit
        def run(params, stats, bufs):
            def loss(p, images):
                if train:
                    out, _ = model.apply(
                        {"params": p, "batch_stats": stats}, images, True,
                        mutable=["batch_stats"])
                else:
                    out = model.apply(
                        {"params": p, "batch_stats": stats}, images, False)
                pose2d_pred = decode_heatmaps(out.heatmaps, True)
                total, _ = loss_computer(
                    heatmaps_pred=out.heatmaps, heatmaps_gt=hm0,
                    pose2d_pred=pose2d_pred, pose2d_gt=joints,
                    visibility=vis)
                return total

            def step(carry, images):
                g = jax.grad(loss)(params, images)
                return carry + sum(l.reshape(-1)[0]
                                   for l in jax.tree.leaves(g)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), bufs)
            return acc
        return run

    configs = [
        ("baseline train-BN (f32, full batch)", True, dict()),
        ("eval-BN floor (running stats)", False, dict()),
        ("bf16 stat accumulation", True, dict(stat_dtype="bfloat16")),
        (f"ghost-BN stats over {BATCH // 4}", True,
         dict(stat_samples=BATCH // 4)),
        (f"ghost-BN stats over {BATCH // 8}", True,
         dict(stat_samples=BATCH // 8)),
        (f"ghost-BN bf16 over {BATCH // 4}", True,
         dict(stat_samples=BATCH // 4, stat_dtype="bfloat16")),
    ]
    for label, train, levers in configs:
        set_bn_levers(**levers)
        try:
            ms = timed_ms(fwd_bwd_chunk(train), params, stats, bufs)
        finally:
            set_bn_levers()
        print(f"fwd+bwd+loss [{label:38s}]: {ms:7.2f} ms "
              f"({BATCH / ms * 1000:.0f} fps-equivalent)", flush=True)


if __name__ == "__main__":
    main()
