"""End-to-end A/B: bf16 fast path vs int8-trunk quant path on the flagship.

Times both with the bench.py methodology and reports the decoded-coordinate
shift between them on the same batch.

    python tools/perf_quant_e2e.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.config.defaults import (
    POSE_HIGH_RESOLUTION_NET_EXTRA)
from hrnet_hand_pose_estimation_tpu.models import build_model

BATCH = 128
CHUNK = 8
DISPATCHES = 6


def flagship_cfg():
    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.HEATMAP_SOFTMAX = True
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.MODEL.EXTRA.merge_from_mapping(POSE_HIGH_RESOLUTION_NET_EXTRA)
    return cfg.freeze()


def timed_fps(fn, *args) -> float:
    @jax.jit
    def chunked(*a):
        def step(carry, images):
            pose = fn(*a[:-1], images)
            return carry + jnp.sum(pose), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), a[-1])
        return acc

    float(chunked(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(DISPATCHES):
        acc = chunked(*args)
    float(acc)
    total = time.perf_counter() - t0 - 0.03
    return BATCH * CHUNK * DISPATCHES / total


def main():
    cfg = flagship_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    bufs = jnp.asarray(rng.normal(
        size=(CHUNK, BATCH, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), bufs[0][:1], False)
    print("init done", flush=True)

    from hrnet_hand_pose_estimation_tpu.core.fast_infer import make_fast_infer
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        calibrate, make_quant_infer, prepare_quant_params)

    fast = make_fast_infer(cfg, pallas_layer1=True)
    fps_bf16 = timed_fps(fast, variables, bufs)
    print(f"bf16 fast path: {fps_bf16:.0f} fps", flush=True)

    t0 = time.time()
    amax = calibrate(cfg, variables, [bufs[0][:16]])
    print(f"calibrated {len(amax)} sites in {time.time()-t0:.0f}s", flush=True)

    ref = np.asarray(fast(variables, bufs[0]))

    def report(tag, qparams):
        qfn = make_quant_infer(cfg)
        fps_q = timed_fps(qfn, variables, qparams, bufs)
        print(f"[{tag}] int8 trunk: {fps_q:.0f} fps  "
              f"({fps_q/fps_bf16:.3f}x)", flush=True)
        got = np.asarray(qfn(variables, qparams, bufs[0]))
        print(f"[{tag}] decode shift vs bf16 fast path: "
              f"max {np.abs(got-ref).max():.5f} px, "
              f"mean {np.abs(got-ref).mean():.5f} px", flush=True)

    for scope in ("branch", "exchange", "wide"):
        t0 = time.time()
        qparams = prepare_quant_params(cfg, variables, amax, scope=scope)
        print(f"[{scope}] prepared {len(qparams)} int8 sites in "
              f"{time.time()-t0:.0f}s", flush=True)
        report(scope, qparams)

    # the shipped serving config (one definition: prepare_serving_qparams;
    # default scope='exchange' since round 4)
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        prepare_serving_qparams)

    report("exchange+l1chain+stem2",
           prepare_serving_qparams(cfg, variables, amax))
    report("exchange+l1chain+stem2+int8head",
           prepare_serving_qparams(cfg, variables, amax, int8_head=True))


if __name__ == "__main__":
    main()
