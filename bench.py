"""Flagship benchmark: pose_hrnet_w32 @256x256 end-to-end inference on TPU.

Prints ONE JSON line:
    {"metric": "inference_fps", "value": N, "unit": "frames/sec",
     "vs_baseline": N/5000}

Baseline (BASELINE.md): >= 5000 frames/sec/chip for HRNet-w32 256x256
end-to-end inference (forward + soft-argmax decode).  The reference repo
never persisted an absolute fps; 5000/chip is the driver's north star.

Serving configuration measured here: the int8 W8A8 trunk
(core/quant_infer.py) at 'exchange' scope — stage2-4 branch convs PLUS
the transition and exchange-fusion convs quantized with per-channel
weight scales and calibrated per-tensor activation scales, everything
precision-sensitive (stem, Pallas layer1, head/decode) in bf16.
Calibration + weight quantization are offline serving-setup steps and
excluded from the timed region, exactly as compile time is.  Accuracy is
gated in tests/test_quant_infer.py AND at full size on trained weights
(tools/accuracy_gate_full.py: max decode shift 0.033 px vs the f32 walk
for both scopes, 3x under the 0.1 px gate).  Layer1 runs as ONE W8A8
VMEM-resident Pallas chain (ops/pallas/int8_chain.py, measured 6344 vs
6078 fps with the bf16 Pallas layer1; BENCH_L1CHAIN=0 disables), and the
input is raw uint8 normalized on device (serving-realistic, 4x less
host->device traffic — BENCH_UINT8=0 restores pre-normalized f32).
Knobs: BENCH_SCOPE=branch reverts to the round-3 conservative scope
(measured 6420 vs 6615 fps — the exchange scope is +3%, PERF.md round-4
section); BENCH_BF16=1 is the unquantized bf16 fast path (round-2
configuration, ~4500 fps); BENCH_STEM2=1 additionally quantizes the
second stem conv (measured -1.6%, off); BENCH_INT8HEAD=1 feeds the fused
head int8 stage outputs (neutral, off).  Full sweep:
tools/bench_sweep.sh, results in PERF.md.

Methodology note: this environment reaches the TPU through a relay with a
~30 ms round-trip, ``block_until_ready`` can report readiness before device
execution completes, AND each Execute RPC costs ~2 ms of relay dispatch
latency (measured: 29.5 ms/step via per-step dispatches vs 27.3 ms/step
true device time).  The benchmark therefore runs CHUNK inference steps per
dispatch with an on-device ``lax.scan`` over pre-staged rotating input
batches (each step reads a distinct batch from HBM — the same traffic a
device-resident serving loop pays), enqueues several such dispatches, and
times a *value fetch* of the final result — the fetch cannot complete until
every enqueued program has executed — subtracting an independently measured
RTT floor.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: tunnel compiles cost minutes; cache across
# runs.  Repo-local so it survives the /tmp wipes between builder sessions.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.config.defaults import POSE_HIGH_RESOLUTION_NET_EXTRA
from hrnet_hand_pose_estimation_tpu.models import build_model
from hrnet_hand_pose_estimation_tpu.ops.decode import decode_heatmaps

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
CHUNK = 8          # model steps fused into one dispatch (lax.scan)
DISPATCHES = 6


def flagship_cfg():
    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.HEATMAP_SOFTMAX = True
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.MODEL.EXTRA.merge_from_mapping(POSE_HIGH_RESOLUTION_NET_EXTRA)
    return cfg.freeze()


def measure_rtt() -> float:
    """Round-trip floor: a no-compute jitted fetch."""
    x = jnp.zeros((8, 128), jnp.float32)
    g = jax.jit(lambda a: a[0, 0] * 1.0)
    float(g(x))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(x))
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    cfg = flagship_cfg()
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    # CHUNK distinct pre-staged batches, iterated on-device by lax.scan
    bufs = jnp.asarray(rng.normal(
        size=(CHUNK, BATCH, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), bufs[0][:1], False)

    if os.environ.get("BENCH_BF16"):
        # round-2 configuration: bf16 fast path (Pallas layer1 + fused head)
        from hrnet_hand_pose_estimation_tpu.core.fast_infer import make_fast_infer

        fast = make_fast_infer(cfg, pallas_layer1=True)

        def infer_one(variables, images):
            return fast(variables, images)
    else:
        # production serving path: int8 W8A8 trunk (see module docstring);
        # calibration + weight quant are offline setup, outside the timing
        from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
            calibrate, make_quant_infer, prepare_serving_qparams)

        amax = calibrate(cfg, variables, [bufs[0][:16]])
        qparams = prepare_serving_qparams(
            cfg, variables, amax,
            scope=os.environ.get("BENCH_SCOPE", "exchange"),
            stem2=os.environ.get("BENCH_STEM2", "0") != "0",
            layer1_chain=os.environ.get("BENCH_L1CHAIN", "1") != "0",
            int8_head=os.environ.get("BENCH_INT8HEAD", "0") != "0")
        if os.environ.get("BENCH_UINT8", "1") != "0":
            # serving-realistic raw-uint8 input, normalized on device (4x
            # less input traffic than pre-normalized f32)
            from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
                IMAGENET_MEAN, IMAGENET_STD)

            qfn = make_quant_infer(
                cfg, input_norm=(IMAGENET_MEAN, IMAGENET_STD))
            mean = np.asarray(IMAGENET_MEAN, np.float32)
            std = np.asarray(IMAGENET_STD, np.float32)
            bufs = jnp.asarray(np.clip(np.round(
                (np.asarray(bufs) * std + mean) * 255.0), 0, 255
            ).astype(np.uint8))
        else:
            qfn = make_quant_infer(cfg)

        def infer_one(variables, images):
            return qfn(variables, qparams, images)

    @jax.jit
    def infer_chunk(variables, bufs):
        # lax.scan over the staged batches (measured: scan == fori_loop at
        # 28.1 ms/step; a statically unrolled body is ~1.5 ms SLOWER — the
        # 8x-duplicated graph schedules worse)
        def step(carry, images):
            pose = infer_one(variables, images)
            return carry + jnp.sum(pose), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), bufs)
        return acc  # tiny result; fetch forces full execution

    float(infer_chunk(variables, bufs))  # compile + warm
    rtt = measure_rtt()

    t0 = time.perf_counter()
    acc = None
    for _ in range(DISPATCHES):
        acc = infer_chunk(variables, bufs)
    float(acc)  # in-order stream: waits for every enqueued program
    total = time.perf_counter() - t0

    compute = max(total - rtt, 1e-9)
    fps = BATCH * CHUNK * DISPATCHES / compute
    print(json.dumps({
        "metric": "inference_fps",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
