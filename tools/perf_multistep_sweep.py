"""Sweep TPU.STEPS_PER_DISPATCH (K) for the production train path.

perf_train_profile.py measured the shipped K=4 at 139.0 ms/step (921 fps)
against a 128.8 ms fwd+bwd+loss floor; the residual is optimizer + BN-EMA +
~13.6/K ms of per-dispatch relay/host overhead.  This tool isolates the K
axis: one `make_train_multistep` program per K, chained through donated
state, amortized over several dispatches.

    python tools/perf_multistep_sweep.py            # K = 1 2 4 8
    PERF_KS=4,8,16 python tools/perf_multistep_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("PERF_BATCH", "128"))
KS = tuple(int(k.strip()) for k in os.environ.get("PERF_KS", "1,2,4,8").split(","))
DISPATCHES = int(os.environ.get("PERF_DISPATCHES", "4"))


def _dispatch_overhead_s() -> float:
    """Measure host dispatch overhead empirically: time DISPATCHES dispatches
    of a trivially small donated-state jitted program (same chaining pattern
    as the sweep loop) instead of assuming a fixed constant."""
    tiny = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
    x = jnp.zeros((8,), jnp.float32)
    x = tiny(x)  # compile + warm
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(DISPATCHES):
        x = tiny(x)
    jax.block_until_ready(x)
    return time.perf_counter() - t0


def main() -> None:
    from perf_train_profile import flagship_cfg  # tools/ dir on sys.path

    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
        TrainState, make_train_multistep)

    cfg = flagship_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    kmax = max(KS)
    bufs = jnp.asarray(rng.normal(
        size=(kmax, BATCH, 256, 256, 3)).astype(np.float32))
    joints = jnp.asarray(
        rng.uniform(4, 60, size=(kmax, BATCH, 21, 2)).astype(np.float32))
    hm = gaussian_targets(
        joints.reshape(-1, 21, 2), jnp.ones((kmax * BATCH, 21), jnp.float32),
        64, 2).reshape(kmax, BATCH, 64, 64, 21)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), bufs[0][:1], False)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    overhead = _dispatch_overhead_s()
    print(f"init done (B={BATCH}, Ks={KS}, measured dispatch overhead "
          f"{overhead * 1e3:.1f} ms / {DISPATCHES} dispatches)", flush=True)

    for k in KS:
        stacked = {
            "images": bufs[:k], "pose2d": joints[:k],
            "visibility": jnp.ones((k, BATCH, 21), jnp.float32),
            "target_heatmaps": hm[:k],
        }
        p = jax.tree.map(jnp.copy, params)
        s = jax.tree.map(jnp.copy, stats)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                           batch_stats=s, opt_state=tx.init(p))
        multi = make_train_multistep(cfg, model, tx)
        state, losses = multi(state, stacked)          # compile + warm
        float(losses["total_loss"][-1])
        t0 = time.perf_counter()
        for _ in range(DISPATCHES):
            state, losses = multi(state, stacked)      # chained via state
        float(losses["total_loss"][-1])
        total = max(time.perf_counter() - t0 - overhead, 0.0)
        ms = total / (DISPATCHES * k) * 1e3
        print(f"K={k:2d}: {ms:7.2f} ms/step ({BATCH/ms*1000:.0f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
