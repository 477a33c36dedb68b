"""Full-size decode-level int8 accuracy gate on the FLAGSHIP model.

Generalises the tiny-model gate (tests/test_quant_infer.py::
test_int8_trunk_decode_gate_trained) to pose_hrnet_w32 @256x256: train the
full model a few hundred synthetic steps on-device (the trained regime —
the reference's accuracy contract is end-to-end metrics on trained nets,
reference tools/evaluate_2D.py:268-274), then require the SHIPPED serving
configuration (exchange-scope int8 trunk + W8A8 Pallas layer1 chain + W8A8
stem2 + raw-uint8 device-side input — exactly bench.py's defaults) to
decode within 0.1 heatmap px of the unquantized f32 walk on train AND
held-out batches.

Two gates are reported per serving scope (GATE_SCOPES, default
"branch,exchange" — the shipped scope plus the int8-exchange superset):
  [A] int8 serving path on pre-normalized f32 input vs f32 walk
      — isolates int8 quantization drift proper;
  [B] full shipped path on raw uint8 (device-side normalize) vs f32 walk
      on the SAME pixels host-normalized — the deployed configuration.

Meant for the real TPU chip (one full train-step + serving compile each,
~minutes warm via the bench cache; the XLA:CPU backend takes hours on this
graph).  Exit code 0 iff both gates pass.

    python tools/accuracy_gate_full.py                 # 300 steps, B=32
    GATE_STEPS=500 GATE_BATCH=64 python tools/accuracy_gate_full.py
"""

from __future__ import annotations

import json
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

STEPS = int(os.environ.get("GATE_STEPS", "300"))
BATCH = int(os.environ.get("GATE_BATCH", "32"))
HELD = 16
SCOPES = tuple(s.strip() for s in
               os.environ.get("GATE_SCOPES", "branch,exchange").split(","))


def flagship_train_cfg():
    from hrnet_hand_pose_estimation_tpu.config import load_config
    from hrnet_hand_pose_estimation_tpu.config.defaults import (
        POSE_HIGH_RESOLUTION_NET_EXTRA)

    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.HEATMAP_SOFTMAX = True
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.MODEL.EXTRA.merge_from_mapping(POSE_HIGH_RESOLUTION_NET_EXTRA)
    cfg.LOSS.WITH_HEATMAP_LOSS = True
    cfg.LOSS.WITH_POSE2D_LOSS = True
    return cfg.freeze()


def _batches(seed: int, n: int, img: int = 256, hm: int = 64):
    """n synthetic samples in BOTH input forms: raw uint8 pixels and the
    host-normalized f32 of the SAME pixels (data/synthetic.py's renderer +
    normalize_image — the reference ToTensor+Normalize)."""
    from hrnet_hand_pose_estimation_tpu.data.synthetic import (
        render_blob_image, synthetic_pose)
    from hrnet_hand_pose_estimation_tpu.data.transforms import normalize_image
    from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets_np

    u8s, xfs, poses, hms = [], [], [], []
    for idx in range(n):
        rng = np.random.default_rng((seed, idx))
        pose3d = synthetic_pose(rng, size=img * 0.35)
        center = rng.uniform(0.35, 0.65, size=2) * img
        pose2d_img = pose3d[:, :2] + center
        u8 = render_blob_image(pose2d_img, img, rng)
        u8s.append(u8)
        xfs.append(normalize_image(u8))
        pose_hm = pose2d_img * hm / img
        poses.append(pose_hm.astype(np.float32))
        hms.append(gaussian_targets_np(pose_hm, np.ones(21, np.float32), hm, 2.0))
    return (np.stack(u8s), np.stack(xfs).astype(np.float32),
            np.stack(poses), np.stack(hms).astype(np.float32))


def run() -> dict:
    import optax

    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        IMAGENET_MEAN, IMAGENET_STD, calibrate, make_quant_infer,
        prepare_serving_qparams)
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
        TrainState, make_train_step)

    on_tpu = jax.devices()[0].platform != "cpu"
    interpret = not on_tpu  # Pallas kernels need interpret mode off-TPU
    cfg = flagship_train_cfg()
    model = build_model(cfg)

    _, xf_train, pose_train, hm_train = _batches(0, BATCH)
    batch = {
        "images": jnp.asarray(xf_train),
        "target_heatmaps": jnp.asarray(hm_train),
        "pose2d": jnp.asarray(pose_train),
        "visibility": jnp.ones((BATCH, 21), jnp.float32),
    }
    t0 = time.time()
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), batch["images"][:1], False)
    tx = optax.adam(1.5e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(cfg, model, tx)
    state, losses = step(state, batch)  # compile
    print(f"train step compiled+warm in {time.time() - t0:.0f}s "
          f"(loss {float(losses['total_loss']):.3f})", flush=True)
    t0 = time.time()
    for _ in range(STEPS - 1):
        state, losses = step(state, batch)
    total = float(losses["total_loss"])
    print(f"trained {STEPS} steps at B={BATCH} in {time.time() - t0:.0f}s "
          f"(final loss {total:.3f})", flush=True)
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    u8_held, xf_held, pose_held, _ = _batches(1, HELD)

    ref_fn = make_quant_infer(cfg, interpret=interpret, pallas_layer1=False,
                              trunk="f32")
    ref_train = np.asarray(ref_fn(trained, {}, jnp.asarray(xf_train[:HELD])))
    err = np.abs(ref_train - pose_train[:HELD]).mean()
    print(f"trained decode err vs GT: {err:.3f} hm px", flush=True)
    assert err < 1.5, f"did not train to localise (mean err {err:.2f} px)"

    amax = calibrate(cfg, trained, [xf_train[:16]])

    # [A] int8 path, pre-normalized f32 input
    q_fn = make_quant_infer(cfg, interpret=interpret)
    # [B] int8 path, raw uint8 input with device-side normalize
    u8_fn = make_quant_infer(cfg, interpret=interpret,
                             input_norm=(IMAGENET_MEAN, IMAGENET_STD))

    results = {"steps": STEPS, "batch": BATCH, "train_decode_err_px": float(err)}
    for scope in SCOPES:
        qparams = prepare_serving_qparams(cfg, trained, amax, scope=scope)
        tag = "" if scope == "branch" else f"_{scope}"
        for name, xf, u8 in (("train", xf_train[:HELD], None),
                             ("held-out", xf_held, u8_held)):
            ref = np.asarray(ref_fn(trained, {}, jnp.asarray(xf)))
            got_a = np.asarray(q_fn(trained, qparams, jnp.asarray(xf)))
            shift_a = float(np.abs(got_a - ref).max())
            results[f"shift_int8{tag}_{name}"] = shift_a
            print(f"[A:{scope}] int8 serving vs f32 walk ({name}): "
                  f"max decode shift {shift_a:.4f} px", flush=True)
            if u8 is not None:
                got_b = np.asarray(u8_fn(trained, qparams, jnp.asarray(u8)))
                shift_b = float(np.abs(got_b - ref).max())
                results[f"shift_uint8{tag}_{name}"] = shift_b
                print(f"[B:{scope}] uint8 path vs f32 walk ({name}): "
                      f"max decode shift {shift_b:.4f} px", flush=True)
    # non-degeneracy: decode varies across samples
    assert ref_train.std(axis=0).max() > 0.5, "degenerate decode"

    ok = all(v < 0.1 for k, v in results.items() if k.startswith("shift_"))
    results["pass"] = bool(ok)
    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    res = run()
    sys.exit(0 if res["pass"] else 1)
