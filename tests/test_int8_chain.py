"""int8 W8A8 Pallas chains (ops/pallas/int8_chain.py): kernel parity in
interpreter mode vs the pure-JAX references (identical quantization math),
and preparation-layout checks against core/quant_infer's scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.pallas.int8_chain import (
    basic_chain_int8_reference,
    bottleneck_chain_int8_reference,
    fused_basic_chain_int8,
    fused_bottleneck_chain_int8,
    prepare_branch_int8,
    prepare_layer1_int8,
)


def _mk_i8(rng, shape):
    return jnp.asarray(rng.integers(-127, 128, size=shape), jnp.int8)


def _mk_f32(rng, shape, scale=0.02):
    return jnp.asarray((rng.normal(size=shape) * scale).astype(np.float32))


def _bottleneck_params(rng, flags, cin, cm, cout):
    """Random params_flat in the documented layout for the given flags."""
    flat = []
    for has_sc in flags:
        flat += [
            jnp.full((1, 1), 9.7, jnp.float32),               # inv1 = 1/sa
            _mk_i8(rng, (cin, cm)),
            jnp.asarray(np.abs(rng.normal(size=(cm,))) * 1e-3 + 1e-4,
                        jnp.float32),                          # a1 > 0
            _mk_f32(rng, (cm,), 0.5),
            _mk_i8(rng, (9 * cm, cm)),
            jnp.asarray(np.abs(rng.normal(size=(cm,))) * 1e-3 + 1e-4,
                        jnp.float32),
            _mk_f32(rng, (cm,), 0.5),
            _mk_i8(rng, (cm, cout)),
            jnp.asarray(np.abs(rng.normal(size=(cout,))) * 1e-3 + 1e-4,
                        jnp.float32),
            _mk_f32(rng, (cout,), 0.01),
        ]
        if has_sc:
            flat += [_mk_i8(rng, (cin, cout)),
                     jnp.asarray(np.abs(rng.normal(size=(cout,))) * 1e-3
                                 + 1e-4, jnp.float32),
                     _mk_f32(rng, (cout,), 0.01)]
        cin = cout
    return tuple(flat)


def test_bottleneck_chain_int8_kernel_matches_reference(rng):
    flags = (True, False)
    cin, cm, cout = 16, 8, 32
    flat = _bottleneck_params(rng, flags, cin, cm, cout)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    want = np.asarray(bottleneck_chain_int8_reference(x, flat, flags),
                      np.float32)
    got = np.asarray(fused_bottleneck_chain_int8(
        x, flat, flags, out_channels=cout, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.abs(want).max() > 0  # non-degenerate


def test_basic_chain_int8_kernel_matches_reference(rng):
    c, n_blocks = 16, 3
    flat = []
    for _ in range(n_blocks):
        flat += [
            jnp.full((1, 1), 11.3, jnp.float32),
            _mk_i8(rng, (9 * c, c)),
            jnp.asarray(np.abs(rng.normal(size=(c,))) * 1e-3 + 1e-4,
                        jnp.float32),
            _mk_f32(rng, (c,), 0.5),
            _mk_i8(rng, (9 * c, c)),
            jnp.asarray(np.abs(rng.normal(size=(c,))) * 1e-3 + 1e-4,
                        jnp.float32),
            _mk_f32(rng, (c,), 0.02),
        ]
    flat = tuple(flat)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    want = np.asarray(basic_chain_int8_reference(x, flat, n_blocks),
                      np.float32)
    got = np.asarray(fused_basic_chain_int8(x, flat, n_blocks,
                                            interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # samples_per_block folding must not change results
    got2 = np.asarray(fused_basic_chain_int8(x, flat, n_blocks,
                                             samples_per_block=2,
                                             interpret=True), np.float32)
    np.testing.assert_allclose(got2, want, atol=1e-5)


@pytest.fixture
def activated(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from tests.test_quant_infer import _activated_variables

    rng = np.random.default_rng(3)
    model = hrnet_from_cfg(tiny_cfg, head="softmax")
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = _activated_variables(model, x, rng)
    return tiny_cfg, v, x


def test_prepare_layer1_int8_matches_quant_walk(activated):
    """The folded-scale chain math == quant_infer's per-site int8 walk on
    layer1 (same calibration records).  The two requantize from different
    float widths (chain: f32 accumulator; walk: bf16 intermediate), so a
    small fraction of activations may differ by one int8 level — the gate
    is a tight relative tolerance, not bit equality (wrong scale folding
    would show O(1) relative errors)."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        _stem, calibrate, prepare_quant_params)

    cfg, v, x = activated
    amax = calibrate(cfg, v, [np.asarray(x)])
    flat, flags = prepare_layer1_int8(v, amax)
    assert flags == (True, False, False, False)

    stem = _stem(v, x, dtype=jnp.float32)
    want = np.asarray(
        bottleneck_chain_int8_reference(stem.astype(jnp.bfloat16), flat,
                                        flags), np.float32)

    from hrnet_hand_pose_estimation_tpu.core.quant_infer import _Walk

    qparams = prepare_quant_params(cfg, v, amax, scope="wide")
    qp_l1 = {k: q for k, q in qparams.items() if k.startswith("layer1/")}
    walk = _Walk(v["params"]["backbone"], v["batch_stats"]["backbone"],
                 "quant", qp_l1, dtype=jnp.bfloat16)
    got = np.asarray(walk.layer1(stem.astype(jnp.bfloat16)), np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.05, (
        f"chain vs walk relative diff "
        f"{np.abs(got - want).max() / scale:.4f}")
    assert np.abs(want).max() > 0.1  # non-degenerate activations


def test_quant_infer_layer1_chain_plumbing(activated):
    """make_quant_infer routes layer1 through the int8 Pallas chain when
    qparams carries LAYER1_CHAIN_KEY (interpret mode; shape/finiteness and
    closeness to the per-site int8 walk at the decoded coords on the same
    quantization — the trained-weights <0.1 px accuracy gate lives in
    test_quant_infer.py)."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        LAYER1_CHAIN_KEY, calibrate, make_quant_infer, prepare_quant_params)

    cfg, v, x = activated
    amax = calibrate(cfg, v, [np.asarray(x)])
    qparams = dict(prepare_quant_params(cfg, v, amax, scope="branch"))
    qparams[LAYER1_CHAIN_KEY] = prepare_layer1_int8(v, amax)[0]
    fn = make_quant_infer(cfg, interpret=True, pallas_layer1=False)
    out = np.asarray(fn(v, qparams, x))
    assert out.shape == (x.shape[0], cfg.MODEL.NUM_JOINTS, 2)
    assert np.isfinite(out).all()

    # + int8 head inputs (HEAD_SCALES_KEY): same plumbing contract
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        HEAD_SCALES_KEY, prepare_head_input_scales)

    qparams[HEAD_SCALES_KEY] = prepare_head_input_scales(amax)
    out2 = np.asarray(fn(v, qparams, x))
    assert out2.shape == out.shape and np.isfinite(out2).all()


def test_quant_infer_mesh_sharded_serving(activated):
    """make_quant_infer(mesh=...) shards the serving batch over the mesh's
    'data' axis (shard_map, Pallas kernels per shard) and matches the
    unsharded entry — the multi-chip serving equivalent of the reference's
    DataParallel eval (reference tools/evaluate_2D.py:176)."""
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        LAYER1_CHAIN_KEY, calibrate, make_quant_infer, prepare_quant_params)
    from hrnet_hand_pose_estimation_tpu.parallel.mesh import make_mesh

    cfg, v, x = activated
    x8 = jnp.concatenate([x] * 4)            # batch 8 = one per device
    amax = calibrate(cfg, v, [np.asarray(x)])
    qparams = dict(prepare_quant_params(cfg, v, amax, stem2=True))
    qparams[LAYER1_CHAIN_KEY] = prepare_layer1_int8(v, amax)[0]

    base = make_quant_infer(cfg, interpret=True, pallas_layer1=False)
    want = np.asarray(base(v, qparams, x8))

    mesh = make_mesh(("data",), (8,))
    sharded = make_quant_infer(cfg, interpret=True, pallas_layer1=False,
                               mesh=mesh)
    out = sharded(v, qparams, x8)
    assert out.sharding.spec[0] == "data", (
        f"serving output not batch-sharded: {out.sharding}")
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_prepare_branch_int8_matches_quant_walk(activated):
    from hrnet_hand_pose_estimation_tpu.core.quant_infer import (
        _Walk, _stem_layer1, calibrate, prepare_quant_params, stage_cfgs)

    cfg, v, x = activated
    amax = calibrate(cfg, v, [np.asarray(x)])
    qparams = prepare_quant_params(cfg, v, amax, scope="branch")

    s2 = stage_cfgs(cfg)[0]
    n_blocks = s2.num_blocks[0]
    flat = prepare_branch_int8(v, amax, "stage2_m0", 0, n_blocks)
    assert len(flat) == 7 * n_blocks

    x1 = _stem_layer1(v, x, pallas=False)
    walk = _Walk(v["params"]["backbone"], v["batch_stats"]["backbone"],
                 "quant", qparams, dtype=jnp.bfloat16)
    # transition1 branch 0 input
    xs = walk.transition([x1], (256,), s2, "transition1")
    want_in = xs[0]
    got = np.asarray(basic_chain_int8_reference(want_in, flat, n_blocks),
                     np.float32)
    want = np.asarray(walk.branch(want_in, "stage2_m0", 0, n_blocks),
                      np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.05
    assert np.abs(want).max() > 0.1
