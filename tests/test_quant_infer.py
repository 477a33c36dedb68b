"""int8 W8A8 trunk (core/quant_infer.py): functional-walk parity vs the Flax
backbone, and the accuracy gate for the quantized path (<0.1 px decoded
drift vs the unquantized walk)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
    _stem_layer1, apply_stages, calibrate, make_quant_infer,
    prepare_quant_params, quant_sites)
from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg


def _activated_variables(model, x, rng, gain=1.4, temp=2.0):
    """Random-but-active weights: He-rescale every conv kernel so spatial
    variation survives depth (the shipped 0.001-std init decays activations
    to per-channel constants within a few layers — every input then decodes
    to the uniform centre and a parity gate is vacuous), randomise BN, and
    set a sharpening softmax temperature so heatmaps are peaked and
    sample-dependent."""
    v = model.init(jax.random.key(0), x, False)

    def boost(tree, path=()):
        out = {}
        for k, leaf in tree.items():
            if isinstance(leaf, dict):
                out[k] = boost(leaf, path + (k,))
            elif k == "kernel" and leaf.ndim >= 2:
                fan_in = int(np.prod(leaf.shape[:-1]))
                std = float(jnp.std(leaf)) + 1e-12
                out[k] = leaf * (gain / np.sqrt(fan_in) / std)
            elif k == "scale":
                out[k] = leaf * jnp.asarray(
                    1.0 + 0.2 * rng.standard_normal(leaf.shape), leaf.dtype)
            elif k == "bias":
                out[k] = leaf + jnp.asarray(
                    0.05 * rng.standard_normal(leaf.shape), leaf.dtype)
            else:
                out[k] = leaf
        return out

    params = boost(v["params"])
    if "trainable_temp" in params:
        params["trainable_temp"] = jnp.asarray(float(temp))
    return {"params": params,
            "batch_stats": jax.tree.map(lambda l: l, v["batch_stats"])}


@pytest.fixture
def activated(tiny_cfg):
    rng = np.random.default_rng(0)
    model = hrnet_from_cfg(tiny_cfg, head="softmax")
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    v = _activated_variables(model, x, rng)
    return tiny_cfg, model, v, x


def test_quant_walk_f32_matches_flax_backbone(activated):
    """The functional walk run in f32 == the Flax backbone in f32 (exact
    topology parity; BN folding is algebraically exact in f32)."""
    cfg, model, v, x = activated
    bb_vars = {"params": v["params"]["backbone"],
               "batch_stats": v["batch_stats"]["backbone"]}
    from hrnet_hand_pose_estimation_tpu.models.hrnet import (
        HRNetBackbone, StageCfg)

    extra = cfg.MODEL.EXTRA
    backbone = HRNetBackbone(
        stage2=StageCfg.from_cfg(extra["STAGE2"]),
        stage3=StageCfg.from_cfg(extra["STAGE3"]),
        stage4=StageCfg.from_cfg(extra["STAGE4"]),
        dtype=jnp.float32)
    ref = backbone.apply(bb_vars, x, False)

    stem = _stem_layer1(v, x, pallas=False, dtype=jnp.float32)
    got, amax = apply_stages(cfg, v, stem, mode="f32", dtype=jnp.float32)
    assert not amax
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        g32, r32 = np.asarray(g, np.float32), np.asarray(r, np.float32)
        scale = max(np.abs(r32).max(), 1e-6)
        assert np.abs(g32 - r32).max() / scale < 2e-4, (
            f"walk diverges from Flax backbone: {np.abs(g32 - r32).max()}")


def test_calibrate_covers_all_quant_sites(activated):
    cfg, model, v, x = activated
    amax = calibrate(cfg, v, [np.asarray(x[:2]), np.asarray(x[2:])])
    for scope in ("branch", "exchange", "wide"):
        sites = quant_sites(cfg, scope)
        missing = [s for s in sites if s not in amax]
        assert not missing, f"[{scope}] uncalibrated sites: {missing[:5]}"
    branch = set(quant_sites(cfg, "branch"))
    exchange = set(quant_sites(cfg, "exchange"))
    wide = set(quant_sites(cfg, "wide"))
    assert branch < exchange < wide
    # 'exchange' is the shipped-chain-compatible superset: no layer1 sites
    assert not any(s.startswith("layer1/") for s in exchange)
    assert any(s.startswith("layer1/") for s in wide)
    assert any("fuse" in s for s in exchange)
    assert any(s.startswith("transition") for s in exchange)
    assert all(m > 0 for m in amax.values())


def test_walk_layer1_matches_folded_chain(activated):
    """The walk's layer1 in f32 == the folded bottleneck chain used by the
    shipped stem path (same math, different code path)."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        _stem, apply_trunk)

    cfg, model, v, x = activated
    ref = _stem_layer1(v, x, pallas=False, dtype=jnp.float32)
    stem = _stem(v, x, dtype=jnp.float32)
    got, _ = apply_trunk(cfg, v, stem, mode="f32", dtype=jnp.float32,
                         include_layer1=True)
    # compare at the stage outputs' first branch after identical stages:
    # instead compare layer1 output directly by running stages on ref
    ref_stages, _ = apply_trunk(cfg, v, ref, mode="f32", dtype=jnp.float32,
                                include_layer1=False)
    for g, r in zip(got, ref_stages):
        g32, r32 = np.asarray(g, np.float32), np.asarray(r, np.float32)
        scale = max(np.abs(r32).max(), 1e-6)
        assert np.abs(g32 - r32).max() / scale < 2e-4


def test_stem2_int8_activation_parity(activated):
    """W8A8 stem2 ('stem2' in qparams) stays within per-tensor quantization
    noise of the bf16 stem output (both per-element and in relative energy;
    a wrong scale/stride/pad would blow past these by orders of magnitude)."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import _stem

    cfg, model, v, x = activated
    amax = calibrate(cfg, v, [np.asarray(x)])
    assert "stem2" in amax
    qparams = prepare_quant_params(cfg, v, amax, stem2=True)
    assert "stem2" in qparams and qparams["stem2"]["kq"].shape[0] == 3

    want = np.asarray(_stem(v, x), np.float32)
    got = np.asarray(_stem(v, x, qparams=qparams), np.float32)
    assert got.shape == want.shape
    # per-tensor int8 on the input + per-channel weights: error bounded by
    # a few input quantization steps through a 576-tap conv
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert rel < 0.05, f"stem2 int8 relative error {rel:.4f}"
    # ~1.6% on this He-boosted random fixture (outlier-heavy activations);
    # a wrong scale/stride/pad measures O(100%)
    energy = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-6)
    assert energy < 0.03, f"stem2 int8 energy ratio {energy:.5f}"


def test_uint8_input_norm_matches_prenormalized(activated):
    """make_quant_infer(input_norm=...) on raw uint8 == the default entry
    on host-prenormalized f32 of the same pixels (identical decode: the
    on-device normalize is the same affine at the same precision point)."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        IMAGENET_MEAN, IMAGENET_STD)

    cfg, model, v, x = activated
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    xf = (u8.astype(np.float32) / 255.0 - mean) / std

    amax = calibrate(cfg, v, [xf])
    qparams = prepare_quant_params(cfg, v, amax)
    base = make_quant_infer(cfg, interpret=True, pallas_layer1=False)
    u8fn = make_quant_infer(cfg, interpret=True, pallas_layer1=False,
                            input_norm=(IMAGENET_MEAN, IMAGENET_STD))
    want = np.asarray(base(v, qparams, jnp.asarray(xf)))
    got = np.asarray(u8fn(v, qparams, jnp.asarray(u8)))
    np.testing.assert_allclose(got, want, atol=0.2)  # bf16 cast-point noise


@pytest.mark.slow
def test_int8_trunk_decode_gate_trained(tiny_cfg):
    """The accuracy gate, on TRAINED weights.

    Random/He-boosted nets are chaotic: even plain bf16-vs-f32 rounding
    shifts decoded coords by PIXELS on them (measured: 3.9 px max on this
    tiny net), so no numeric change can gate there.  Trained networks are
    the deployment regime and are numerically stable; gate: train the tiny
    model to localise synthetic keypoints (pose2d loss — the reference's
    own trainable-softmax recipe; heatmap-L2 vs a softmax head has an
    irreducible ~11.6 floor since the softmax sums to 1 and the Gaussian
    target to ~25, so loss level is not a convergence signal), then
    require the int8 trunk to decode within 0.1 heatmap px of the bf16
    path on train AND held-out batches."""
    import optax

    from hrnet_hand_pose_estimation_tpu.data.synthetic import SyntheticDataset
    from hrnet_hand_pose_estimation_tpu.data.pipeline import (
        DataLoader, default_collate)
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import (
        TrainState, make_train_step)

    cfg = tiny_cfg.clone()
    cfg.LOSS.WITH_POSE2D_LOSS = True
    cfg = cfg.freeze()
    model = build_model(cfg)
    ds = SyntheticDataset(length=16, img_size=64, hm_size=16)
    batch_np = default_collate([ds[i] for i in range(16)])
    batch = {
        "images": jnp.asarray(batch_np["imgs"]),
        "target_heatmaps": jnp.asarray(batch_np["heatmaps"]),
        "pose2d": jnp.asarray(batch_np["pose2d"]),
        "visibility": jnp.ones((16, 21), jnp.float32),
    }
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), batch["images"][:1], False)
    tx = optax.adam(1.5e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(cfg, model, tx)
    for i in range(400):
        state, losses = step(state, batch)

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    x_train = batch["images"]
    # convergence = decoded accuracy (the quantity the gate is about):
    # trained decode must localise the synthetic keypoints to ~1 hm px
    ref_fn0 = make_quant_infer(cfg, interpret=True, pallas_layer1=False,
                               trunk="f32")
    err = np.abs(np.asarray(ref_fn0(trained, {}, x_train))
                 - np.asarray(batch["pose2d"])).mean()
    assert err < 1.5, f"did not train to localise: mean decode err {err:.2f} px"
    # held-out = IN-DISTRIBUTION samples the net never saw (seed 1).  The
    # serving contract is calibration data ~ serving data; on pure-noise
    # inputs (uncalibrated activation ranges + near-uniform heatmaps where
    # argmax is ill-conditioned) the shift measures 1.23 px — documented
    # out-of-distribution bound, not a serving regime.
    ds_held = SyntheticDataset(length=8, img_size=64, hm_size=16, seed=1)
    x_held = jnp.asarray(
        default_collate([ds_held[i] for i in range(8)])["imgs"])

    amax = calibrate(cfg, trained, [np.asarray(x_train)])
    qparams = prepare_quant_params(cfg, trained, amax)
    ref_fn = ref_fn0
    q_fn = make_quant_infer(cfg, interpret=True, pallas_layer1=False,
                            trunk="quant")
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        LAYER1_CHAIN_KEY)
    from hrnet_hand_pose_estimation_tpu.ops.pallas.int8_chain import (
        prepare_layer1_int8)

    # the shipped serving config: branch scope + int8 Pallas layer1 chain
    # + W8A8 stem2 + int8 head inputs (bench.py BENCH defaults)
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        HEAD_SCALES_KEY, prepare_head_input_scales)

    qparams_chain = dict(prepare_quant_params(cfg, trained, amax,
                                              stem2=True))
    qparams_chain[LAYER1_CHAIN_KEY] = prepare_layer1_int8(trained, amax)[0]
    qparams_chain[HEAD_SCALES_KEY] = prepare_head_input_scales(amax)
    # 'exchange' scope on top of the chain: int8 transitions + fuse convs
    qparams_exch = dict(prepare_quant_params(cfg, trained, amax,
                                             scope="exchange"))
    qparams_exch[LAYER1_CHAIN_KEY] = qparams_chain[LAYER1_CHAIN_KEY]
    for x in (x_train, x_held):
        ref = np.asarray(ref_fn(trained, {}, x))
        got = np.asarray(q_fn(trained, qparams, x))
        shift = np.abs(got - ref).max()
        assert shift < 0.1, f"int8 decode shift {shift:.4f} px >= 0.1 px"
        # int8 Pallas layer1 chain + stem2 + int8-head path: same gate
        got_chain = np.asarray(q_fn(trained, qparams_chain, x))
        shift = np.abs(got_chain - ref).max()
        assert shift < 0.1, (
            f"int8 chain+stem2+head decode shift {shift:.4f} px >= 0.1 px")
        # exchange scope (int8 transitions + exchange-fusion convs): same gate
        got_exch = np.asarray(q_fn(trained, qparams_exch, x))
        shift = np.abs(got_exch - ref).max()
        assert shift < 0.1, (
            f"int8 exchange-scope decode shift {shift:.4f} px >= 0.1 px")
    # trained-regime sanity: decode varies across samples (non-degenerate)
    assert np.asarray(ref_fn(trained, {}, x_train)).std(axis=0).max() > 0.5


def test_calibration_record_roundtrip(activated, tmp_path):
    """save_calibration/load_calibration: the serving flow 'calibrate once
    offline, ship the record' (tools/calibrate.py) must reproduce the
    on-the-fly qparams exactly, and a record made for another model must be
    rejected."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        load_calibration, prepare_serving_qparams, save_calibration)

    cfg, model, v, x = activated
    amax = calibrate(cfg, v, [np.asarray(x)])
    path = str(tmp_path / "calibration.json")
    save_calibration(path, amax, cfg)
    loaded = load_calibration(path, cfg)
    assert set(loaded) == set(amax)
    for site in amax:
        assert loaded[site] == pytest.approx(float(amax[site]), rel=1e-6)

    # qparams built from the loaded record == from the fresh amax
    qp_fresh = prepare_serving_qparams(cfg, v, amax, layer1_chain=False)
    qp_loaded = prepare_serving_qparams(cfg, v, loaded, layer1_chain=False)
    assert set(qp_fresh) == set(qp_loaded)
    for site in qp_fresh:
        np.testing.assert_array_equal(np.asarray(qp_fresh[site]["kq"]),
                                      np.asarray(qp_loaded[site]["kq"]))
        assert float(qp_fresh[site]["sa"]) == float(qp_loaded[site]["sa"])

    # model stamp guards against cross-architecture reuse
    import json

    rec = json.load(open(path))
    rec["model"] = "pose_resnet"
    mismatched = str(tmp_path / "wrong.json")
    json.dump(rec, open(mismatched, "w"))
    with pytest.raises(ValueError, match="made for model"):
        load_calibration(mismatched, cfg)

    # image-size stamp guards against cross-resolution reuse (activation
    # maxima are resolution-dependent)
    rec = json.load(open(path))
    rec["image_size"] = [2 * int(v) for v in rec["image_size"]]
    wrong_size = str(tmp_path / "wrong_size.json")
    json.dump(rec, open(wrong_size, "w"))
    with pytest.raises(ValueError, match="image size"):
        load_calibration(wrong_size, cfg)


@pytest.mark.slow
def test_int8_trunk_full_depth_feature_gate():
    """FULL-depth w32 int8 walk: per-branch feature error stays bounded.

    The tiny decode gate (test_int8_trunk_decode_gate_trained) proves the
    <0.1 px serving contract in the trained regime; this test proves the
    quantized walk stays numerically coherent over the full 208-site w32
    topology (4 stages, 104 branch convs deep).  The gate is FEATURE
    relative error, not decoded pixels: on random He-boosted weights the
    softmax heatmaps are essentially flat (max prob ~3x uniform), and
    soft-argmax of a near-uniform distribution amplifies any perturbation
    into tens of pixels — an artifact of the degenerate fixture, not of
    quantization (trained heatmaps are peaked, where decode is robust;
    measured: ~2.5% feature error here vs <0.1 px decode shift on trained
    weights)."""
    from hrnet_hand_pose_estimation_tpu.config import load_config
    from hrnet_hand_pose_estimation_tpu.config.defaults import (
        POSE_HIGH_RESOLUTION_NET_EXTRA)
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        _stem, apply_trunk)
    from functools import partial

    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.HEATMAP_SOFTMAX = True
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.MODEL.EXTRA.merge_from_mapping(POSE_HIGH_RESOLUTION_NET_EXTRA)
    cfg = cfg.freeze()
    model = hrnet_from_cfg(cfg, head="softmax")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    v = _activated_variables(model, x, rng)

    amax = calibrate(cfg, v, [np.asarray(x)])
    qparams = prepare_quant_params(cfg, v, amax, scope="branch")
    assert len(qparams) == 208  # 2 convs x 104 BasicBlocks across stages 2-4

    @partial(jax.jit, static_argnames=("mode",))
    def feats(v, x, mode, qp):
        s = _stem(v, x)
        xs, _ = apply_trunk(cfg, v, s, mode=mode, qparams=qp,
                            include_layer1=True)
        return xs

    ref = feats(v, x, "f32", {})
    got = feats(v, x, "quant", qparams)
    for i, (r, g) in enumerate(zip(ref, got)):
        r = np.asarray(r, np.float32)
        g = np.asarray(g, np.float32)
        assert g.shape == r.shape
        rel = np.abs(g - r).mean() / (np.abs(r).mean() + 1e-9)
        assert rel < 0.05, f"branch{i} int8 feature error {rel:.4f} >= 5%"
