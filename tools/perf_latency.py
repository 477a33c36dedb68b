"""Serving-latency realism probe: p50/p99 per-request latency for the
SHIPPED int8 serving path at several batch sizes, alongside the peak-fps
number bench.py publishes.

The reference's eval prints fps only (reference tools/evaluate_2D.py:280);
production serving cares about tail latency at the batch the load balancer
actually forms.  This tool measures ONE dispatch per request (no chunked
scan — that is the throughput configuration), fetches the decoded coords
(the fetch cannot complete before device execution), and reports:

- raw wall-clock per request through this environment's TPU relay, and
- the RTT-floor-subtracted device estimate (the relay adds a ~30 ms
  round-trip that a co-located server would not pay; the floor is measured
  per run exactly as bench.py does).

Usage:  python tools/perf_latency.py [--batches 8,32,128] [--iters 200]
Writes one JSON line per batch size; paste the table into PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,128")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=20)
    args = ap.parse_args()

    import bench  # repo-root flagship bench: reuse its config + RTT floor

    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        IMAGENET_MEAN, IMAGENET_STD, calibrate, make_quant_infer,
        prepare_serving_qparams)
    from hrnet_hand_pose_estimation_tpu.models import build_model

    cfg = bench.flagship_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(16, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x1[:1], False)

    # shipped serving configuration (bench.py defaults): int8 'exchange'
    # trunk + W8A8 Pallas layer1 chain + raw-uint8 device-side normalize
    amax = calibrate(cfg, variables, [x1])
    qparams = prepare_serving_qparams(cfg, variables, amax, scope="exchange")
    qfn = make_quant_infer(cfg, input_norm=(IMAGENET_MEAN, IMAGENET_STD))

    rtt_ms = bench.measure_rtt() * 1e3
    print(f"# RTT floor: {rtt_ms:.2f} ms", file=sys.stderr, flush=True)

    for b in [int(s) for s in args.batches.split(",")]:
        imgs = jnp.asarray(rng.integers(
            0, 256, size=(b, 256, 256, 3), dtype=np.uint8))
        np.asarray(qfn(variables, qparams, imgs))  # compile + warm
        lat = []
        for i in range(args.warmup + args.iters):
            t0 = time.perf_counter()
            out = np.asarray(qfn(variables, qparams, imgs))  # fetch = barrier
            dt = time.perf_counter() - t0
            if i >= args.warmup:
                lat.append(dt * 1e3)
        assert out.shape == (b, cfg.MODEL.NUM_JOINTS, 2)
        lat = np.asarray(lat)
        p50, p99 = np.percentile(lat, [50, 99])
        print(json.dumps({
            "metric": "serving_latency", "batch": b, "iters": args.iters,
            "p50_ms": round(float(p50), 2),
            "p99_ms": round(float(p99), 2),
            "mean_ms": round(float(lat.mean()), 2),
            "rtt_floor_ms": round(rtt_ms, 2),
            "p50_device_est_ms": round(float(p50) - rtt_ms, 2),
            "p99_device_est_ms": round(float(p99) - rtt_ms, 2),
            "fps_at_batch": round(b / (lat.mean() / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
