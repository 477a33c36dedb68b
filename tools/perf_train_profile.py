"""Training-step breakdown on the real chip (PERF.md round-3).

The inference path has a full cumulative-ablation breakdown; this produces
the same for fwd+bwd, plus isolates the two suspected overheads:
BN train-mode statistics and the optimizer update.

Sections (each timed with the chunked-dispatch methodology):
1. cumulative fwd+bwd through stem+layer1 / +stage2 / +stage3 / +stage4 /
   +head-loss (grad of the 2D loss wrt params)
2. full make_train_step (donated, adam, BN stats)  — the anchor
3. train step with SGD instead of adam              — optimizer delta
4. fwd+bwd with eval-mode BN (running stats)        — BN-stat delta

    python tools/perf_train_profile.py
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.config.defaults import (
    POSE_HIGH_RESOLUTION_NET_EXTRA)
from hrnet_hand_pose_estimation_tpu.models import build_model

BATCH = 128
CHUNK = 4
DISPATCHES = 4


def flagship_cfg():
    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.HEATMAP_SOFTMAX = True
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.LOSS.WITH_POSE2D_LOSS = True
    cfg.LOSS.WITH_HEATMAP_LOSS = True
    cfg.MODEL.EXTRA.merge_from_mapping(POSE_HIGH_RESOLUTION_NET_EXTRA)
    return cfg.freeze()


def timed_ms(fn, *args) -> float:
    """ms per model step; fn is a jitted chunk program over CHUNK batches."""
    r = fn(*args)
    jax.tree.map(lambda l: l.block_until_ready(), r)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    out = None
    for _ in range(DISPATCHES):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    total = time.perf_counter() - t0 - 0.03
    return total / (DISPATCHES * CHUNK) * 1e3


def main():
    cfg = flagship_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    bufs = jnp.asarray(rng.normal(
        size=(CHUNK, BATCH, 256, 256, 3)).astype(np.float32))
    joints = jnp.asarray(
        rng.uniform(4, 60, size=(CHUNK, BATCH, 21, 2)).astype(np.float32))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), bufs[0][:1], False)
    params, stats = variables["params"], variables["batch_stats"]
    print("init done", flush=True)

    # ---- 1. cumulative fwd+bwd ablation over the backbone --------------
    from hrnet_hand_pose_estimation_tpu.models.hrnet import (
        HRNetBackbone, StageCfg)

    extra = cfg.MODEL.EXTRA

    def backbone_upto(n_stages):
        s2 = StageCfg.from_cfg(extra["STAGE2"])
        s3 = StageCfg.from_cfg(extra["STAGE3"])
        s4 = StageCfg.from_cfg(extra["STAGE4"])
        if n_stages <= 2:
            s3 = s3._replace(num_modules=0)
        if n_stages <= 3:
            s4 = s4._replace(num_modules=0)
        return HRNetBackbone(s2, s3, s4)

    def grad_chunk(apply_fn):
        @jax.jit
        def run(params, stats, bufs):
            def loss(p, images):
                outs = apply_fn(p, stats, images)
                return jnp.sum(jnp.asarray(
                    [jnp.sum(o.astype(jnp.float32) ** 2) for o in
                     jax.tree.leaves(outs)]))

            def step(carry, images):
                g = jax.grad(loss)(params, images)
                return carry + sum(l.reshape(-1)[0]
                               for l in jax.tree.leaves(g)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), bufs)
            return acc
        return run

    # full-variable trees work for truncated nets: flax ignores extra keys?
    # they do NOT — so init each truncated net separately.
    prev = 0.0
    for n, label in ((2, "stem+l1+stage2"), (3, "+stage3"), (4, "+stage4")):
        net = backbone_upto(n)
        v = jax.jit(net.init, static_argnums=(2,))(
            jax.random.key(0), bufs[0][:1], False)

        def apply_fn(p, s, images, net=net):
            return net.apply({"params": p, "batch_stats": s}, images, True,
                             mutable=["batch_stats"])[0]

        ms = timed_ms(grad_chunk(apply_fn), v["params"], v["batch_stats"], bufs)
        print(f"fwd+bwd through {label:16s}: {ms:7.2f} ms  (+{ms-prev:.2f})",
              flush=True)
        prev = ms

    # ---- 1b. fwd+bwd through the REAL model + loss (no optimizer) ------
    from hrnet_hand_pose_estimation_tpu.core.loss_computer import LossComputer2D
    from hrnet_hand_pose_estimation_tpu.ops.decode import decode_heatmaps
    from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets

    loss_computer = LossComputer2D(cfg)
    hm0 = gaussian_targets(joints[0], jnp.ones((BATCH, 21)), 64, 2)

    @jax.jit
    def run_model_loss(params, stats, bufs):
        def loss(p, images):
            out, _ = model.apply({"params": p, "batch_stats": stats}, images,
                                 True, mutable=["batch_stats"])
            pose2d_pred = decode_heatmaps(out.heatmaps, True)
            total, _ = loss_computer(
                heatmaps_pred=out.heatmaps, heatmaps_gt=hm0,
                pose2d_pred=pose2d_pred, pose2d_gt=joints[0],
                visibility=jnp.ones((BATCH, 21), jnp.float32))
            return total

        def step(carry, images):
            g = jax.grad(loss)(params, images)
            return carry + sum(l.reshape(-1)[0]
                               for l in jax.tree.leaves(g)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), bufs)
        return acc

    ms = timed_ms(run_model_loss, params, stats, bufs)
    print(f"fwd+bwd full model + head + loss suite : {ms:7.2f} ms", flush=True)

    # ---- 2-3. full train step: adam vs sgd -----------------------------
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
        TrainState, make_train_step)

    hm = gaussian_targets(joints[0], jnp.ones((BATCH, 21)), 64, 2)
    batch = {"images": bufs[0], "pose2d": joints[0],
             "visibility": jnp.ones((BATCH, 21), jnp.float32),
             "target_heatmaps": hm}

    for name, tx in (("adam", optax.adam(1e-3)),
                     ("sgd", optax.sgd(1e-3, momentum=0.9))):
        # the train step donates its state — give each section fresh buffers
        p = jax.tree.map(jnp.copy, params)
        s = jax.tree.map(jnp.copy, stats)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                           batch_stats=s, opt_state=tx.init(p))
        step = make_train_step(cfg, model, tx)

        t_first = time.perf_counter()
        state, losses = step(state, batch)
        float(losses["total_loss"])
        # donated state: measure steady state by re-stepping
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            state, losses = step(state, batch)
            float(losses["total_loss"])
            times.append(time.perf_counter() - t0)
        ms = (sum(sorted(times)[:4]) / 4 - 0.03) * 1e3
        print(f"full train step [{name}]: {ms:7.2f} ms "
              f"({BATCH/ms*1000:.0f} fps)", flush=True)

    # ---- 4. BN eval-mode fwd+bwd on the full model ----------------------
    @jax.jit
    def run_eval_bn(params, stats, bufs, joints):
        def loss(p, images, j):
            out = model.apply({"params": p, "batch_stats": stats}, images,
                              False)
            return jnp.sum((out.heatmaps.astype(jnp.float32)) ** 2)

        def step(carry, xs):
            images, j = xs
            g = jax.grad(loss)(params, images, j)
            return carry + sum(l.reshape(-1)[0]
                               for l in jax.tree.leaves(g)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), (bufs, joints))
        return acc

    ms = timed_ms(run_eval_bn, params, stats, bufs, joints)
    print(f"fwd+bwd, EVAL-mode BN (no stat updates): {ms:7.2f} ms", flush=True)

    # ---- 4b. isolate the step machinery: guard off / minimal raw step --
    cfg_noguard = flagship_cfg().clone()
    cfg_noguard.TPU.DETECT_ANOMALY = False
    cfg_noguard = cfg_noguard.freeze()
    tx = optax.adam(1e-3)
    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, stats)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                       batch_stats=s, opt_state=tx.init(p))
    step = make_train_step(cfg_noguard, model, tx)
    state, losses = step(state, batch)
    float(losses["total_loss"])
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, losses = step(state, batch)
        float(losses["total_loss"])
        times.append(time.perf_counter() - t0)
    ms = (sum(sorted(times)[:4]) / 4 - 0.03) * 1e3
    print(f"full train step [adam, DETECT_ANOMALY=0]: {ms:7.2f} ms "
          f"({BATCH/ms*1000:.0f} fps)", flush=True)

    # minimal raw step: grad + adam, no guard, no loss dict
    @partial(jax.jit, donate_argnums=(0,))
    def raw_step(carry, images):
        p, s, m = carry

        def loss(p):
            out, mut = model.apply({"params": p, "batch_stats": s}, images,
                                   True, mutable=["batch_stats"])
            pose2d_pred = decode_heatmaps(out.heatmaps, True)
            total, _ = loss_computer(
                heatmaps_pred=out.heatmaps, heatmaps_gt=hm0,
                pose2d_pred=pose2d_pred, pose2d_gt=joints[0],
                visibility=jnp.ones((BATCH, 21), jnp.float32))
            return total, mut["batch_stats"]

        (total, new_s), g = jax.value_and_grad(loss, has_aux=True)(p)
        updates, new_m = tx.update(g, m, p)
        return (optax.apply_updates(p, updates), new_s, new_m), total

    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, stats)
    carry = (p, s, tx.init(p))
    carry, total = raw_step(carry, bufs[0])
    float(total)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        carry, total = raw_step(carry, bufs[0])
        float(total)
        times.append(time.perf_counter() - t0)
    ms = (sum(sorted(times)[:4]) / 4 - 0.03) * 1e3
    print(f"minimal raw step (grad+adam only)      : {ms:7.2f} ms "
          f"({BATCH/ms*1000:.0f} fps)", flush=True)

    # ---- 5. K steps per dispatch (TPU.STEPS_PER_DISPATCH production path)
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
        make_train_multistep)

    hm_all = gaussian_targets(
        joints.reshape(-1, 21, 2),
        jnp.ones((CHUNK * BATCH, 21), jnp.float32), 64, 2
    ).reshape(CHUNK, BATCH, 64, 64, 21)
    stacked = {"images": bufs, "pose2d": joints,
               "visibility": jnp.ones((CHUNK, BATCH, 21), jnp.float32),
               "target_heatmaps": hm_all}
    tx = optax.adam(1e-3)
    p = jax.tree.map(jnp.copy, params)
    s = jax.tree.map(jnp.copy, stats)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=p,
                       batch_stats=s, opt_state=tx.init(p))
    multi = make_train_multistep(cfg, model, tx)
    state, losses_k = multi(state, stacked)            # compile + warm
    float(losses_k["total_loss"][-1])
    t0 = time.perf_counter()
    for _ in range(DISPATCHES):
        state, losses_k = multi(state, stacked)        # chained via state
    float(losses_k["total_loss"][-1])
    total = time.perf_counter() - t0 - 0.03
    ms = total / (DISPATCHES * CHUNK) * 1e3
    print(f"full train step [adam, x{CHUNK}/dispatch]: {ms:7.2f} ms "
          f"({BATCH/ms*1000:.0f} fps)", flush=True)


if __name__ == "__main__":
    main()
