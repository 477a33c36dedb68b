"""Pallas kernel parity (interpreter mode on CPU) vs the XLA compositions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.decode import soft_argmax, spatial_softmax
from hrnet_hand_pose_estimation_tpu.ops.pallas.decode_kernel import (
    fused_gaussian_targets,
    fused_softmax_decode,
)
from hrnet_hand_pose_estimation_tpu.ops.targets import gaussian_targets


def test_fused_decode_matches_xla(rng):
    logits = jnp.asarray(rng.normal(size=(3, 16, 16, 21)).astype(np.float32)) * 3.0
    for temp in (1.0, 2.5):
        want = np.asarray(soft_argmax(spatial_softmax(logits, temp)))
        got = np.asarray(fused_softmax_decode(logits, temp, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_decode_bf16_input(rng):
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    got = np.asarray(fused_softmax_decode(logits.astype(jnp.bfloat16), 1.0,
                                          interpret=True))
    want = np.asarray(soft_argmax(spatial_softmax(logits.astype(jnp.bfloat16), 1.0)))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_fused_targets_match_xla(rng):
    joints = jnp.asarray(rng.uniform(-3, 19, size=(4, 21, 2)).astype(np.float32))
    vis = jnp.asarray((rng.uniform(size=(4, 21)) > 0.3).astype(np.float32))
    for sigma in (1.0, 2.0):
        want = np.asarray(gaussian_targets(joints, vis, 16, sigma))
        got = np.asarray(fused_gaussian_targets(joints, vis, 16, sigma,
                                                interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_bottleneck_chain_parity(rng):
    from hrnet_hand_pose_estimation_tpu.ops.pallas.fused_bottleneck import (
        fused_bottleneck_chain,
        layer1_reference,
    )

    def mk(shape, scale=0.05, dt=jnp.bfloat16):
        return jnp.asarray((rng.normal(size=shape) * scale).astype(np.float32)).astype(dt)

    flags = (True, False)
    flat = []
    cin = 16
    for has_sc in flags:
        cm, cout = 8, 32
        flat += [mk((cin, cm)), mk((cm,), dt=jnp.float32),
                 mk((3, 3, cm, cm)), mk((cm,), dt=jnp.float32),
                 mk((cm, cout)), mk((cout,), dt=jnp.float32)]
        if has_sc:
            flat += [mk((cin, cout)), mk((cout,), dt=jnp.float32)]
        cin = cout
    x = mk((2, 16, 16, 16), scale=1.0)
    want = np.asarray(layer1_reference(x, flat, flags), np.float32)
    got = np.asarray(fused_bottleneck_chain(x, tuple(flat), flags, out_channels=32,
                                            interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=0.02)  # bf16 rounding


def test_fused_basic_chain_parity(rng):
    from hrnet_hand_pose_estimation_tpu.ops.pallas.fused_bottleneck import (
        basic_chain_reference,
        fused_basic_chain,
    )

    def mk(shape, scale=0.05, dt=jnp.bfloat16):
        return jnp.asarray((rng.normal(size=shape) * scale).astype(np.float32)).astype(dt)

    c = 16
    flat = []
    for _ in range(3):
        flat += [mk((3, 3, c, c)), mk((c,), dt=jnp.float32),
                 mk((3, 3, c, c)), mk((c,), dt=jnp.float32)]
    x = mk((2, 8, 8, c), scale=1.0)
    want = np.asarray(basic_chain_reference(x, flat, 3), np.float32)
    got = np.asarray(fused_basic_chain(x, tuple(flat), 3, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=0.02)


def test_fused_head_decode_parity(rng):
    from hrnet_hand_pose_estimation_tpu.ops.pallas.fused_head_decode import (
        HeadParams,
        fused_head_decode,
    )
    from hrnet_hand_pose_estimation_tpu.ops.upsample import (
        upsample_bilinear_align_corners,
    )

    xs = [jnp.asarray(rng.normal(size=(2, s, s, c)).astype(np.float32))
          for s, c in [(16, 8), (8, 16), (4, 32), (2, 64)]]
    params = HeadParams(
        w_head=jnp.asarray(rng.normal(size=(120, 120)).astype(np.float32)) * 0.1,
        b_head=jnp.asarray(rng.normal(size=(120,)).astype(np.float32)) * 0.1,
        w_final=jnp.asarray(rng.normal(size=(120, 21)).astype(np.float32)) * 0.1,
        b_final=jnp.asarray(rng.normal(size=(21,)).astype(np.float32)) * 0.1,
        temp=jnp.asarray(1.3))
    feats = [xs[0]] + [upsample_bilinear_align_corners(t, (16, 16)) for t in xs[1:]]
    feat = jnp.concatenate(feats, -1)
    y = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", feat, params.w_head) + params.b_head)
    logits = jnp.einsum("bhwd,dk->bhwk", y, params.w_final) + params.b_final
    want = np.asarray(soft_argmax(spatial_softmax(logits, 1.3)))
    got = np.asarray(fused_head_decode(xs, params, interpret=True))
    np.testing.assert_allclose(got, want, atol=0.05)  # bf16 head matmuls


def test_fused_head_decode_v2_int8_inputs(rng):
    """int8-input head (input_scales) == the bf16 head fed the dequantized
    tensors, up to bf16 rounding of where the scale multiplies (weights vs
    activations — the fold is exact linear algebra)."""
    from hrnet_hand_pose_estimation_tpu.ops.pallas.fused_head_decode import (
        HeadParams,
        fused_head_decode_v2,
    )

    xs_i8 = [jnp.asarray(rng.integers(0, 128, size=(4, s, s, c)), jnp.int8)
             for s, c in [(16, 8), (8, 16), (4, 32), (2, 64)]]
    scales = tuple(jnp.float32(v) for v in (0.011, 0.023, 0.017, 0.029))
    xs_bf = [(x.astype(jnp.float32) * sa).astype(jnp.bfloat16)
             for x, sa in zip(xs_i8, scales)]
    params = HeadParams(
        w_head=jnp.asarray(rng.normal(size=(120, 120)).astype(np.float32)) * 0.1,
        b_head=jnp.asarray(rng.normal(size=(120,)).astype(np.float32)) * 0.1,
        w_final=jnp.asarray(rng.normal(size=(120, 21)).astype(np.float32)) * 0.1,
        b_final=jnp.asarray(rng.normal(size=(21,)).astype(np.float32)) * 0.1,
        temp=jnp.asarray(1.3))
    want = np.asarray(fused_head_decode_v2(xs_bf, params, interpret=True))
    got = np.asarray(fused_head_decode_v2(xs_i8, params, interpret=True,
                                          input_scales=scales))
    assert got.shape == want.shape == (4, 21, 2)
    np.testing.assert_allclose(got, want, atol=0.1)


def test_fast_infer_path_parity(tiny_cfg, monkeypatch, rng):
    """End-to-end fast path (fused head decode) vs standard model coords."""
    from hrnet_hand_pose_estimation_tpu.core.fast_infer import make_fast_infer
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg

    std = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = std.init(jax.random.key(0), x, False)
    v = jax.tree.map(
        lambda a: jnp.asarray((rng.normal(size=a.shape) * 0.05).astype(np.float32))
        if a.ndim > 1 else
        jnp.asarray((np.abs(rng.normal(size=a.shape)) * 0.05 + 0.5).astype(np.float32)),
        v)
    out = std.apply(v, x, False)
    want = np.asarray(soft_argmax(out.heatmaps))
    fast = make_fast_infer(tiny_cfg, pallas_layer1=False, interpret=True)
    got = np.asarray(fast(v, x))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_s2d_stem_exact_rewrite(rng):
    """Space-to-depth stem (2x2/s1 convs on block-rearranged input) computes
    the same sums as the standard stride-2 stem up to float summation order
    (core/fast_infer._s2d_kernel).  Checked directly on the stem output in
    f32 with randomised weights — edges included, so a wrong padding side
    would show O(1) errors, not 1e-5.  (An end-to-end coordinate comparison
    in bf16 is NOT a valid check: the 1-ulp rounding difference from the
    reordered accumulation amplifies chaotically through a random-weight
    net and flips decode argmaxes.)"""
    from flax import linen as nn

    from hrnet_hand_pose_estimation_tpu.core.fast_infer import _s2d_stem_apply
    from hrnet_hand_pose_estimation_tpu.models.layers import ConvBN

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBN(64, 3, 2, relu=True, dtype=jnp.float32, name="stem1")(x, train)
            return ConvBN(64, 3, 2, relu=True, dtype=jnp.float32, name="stem2")(x, train)

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    stem = Stem()
    v = stem.init(jax.random.key(0), x)
    v = jax.tree.map(
        lambda a: jnp.asarray((rng.normal(size=a.shape) * 0.5).astype(np.float32))
        if a.ndim > 1 else
        jnp.asarray((np.abs(rng.normal(size=a.shape)) * 0.5 + 0.5).astype(np.float32)),
        v)
    want = np.asarray(stem.apply(v, x))
    wrapped = {"params": {"backbone": v["params"]},
               "batch_stats": {"backbone": v["batch_stats"]}}
    got = np.asarray(_s2d_stem_apply(wrapped, x, jnp.float32))
    assert np.abs(want).max() > 1.0  # non-degenerate activations
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


def test_s2d_stem_end_to_end_pipeline(tiny_cfg, rng):
    """The s2d fast path runs end to end and matches the standard fast path
    on a freshly initialised net (plumbing/shape check; see the unit test
    above for the arithmetic)."""
    from hrnet_hand_pose_estimation_tpu.core.fast_infer import make_fast_infer
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg

    std = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = std.init(jax.random.key(0), x, False)
    a = np.asarray(make_fast_infer(tiny_cfg, pallas_layer1=False, interpret=True)(v, x))
    b = np.asarray(make_fast_infer(tiny_cfg, pallas_layer1=False, interpret=True,
                                   s2d_stem=True)(v, x))
    assert a.shape == b.shape == (2, 21, 2)
    np.testing.assert_allclose(a, b, atol=0.5)


def test_fused_stem_layer1_end_to_end_pipeline(tiny_cfg, rng):
    """make_fast_infer(fuse_stem_layer1=True) (the whole-stem+layer1 Pallas
    kernel) matches the standard fast path end to end in interpret mode —
    same parity contract as the s2d test above."""
    from hrnet_hand_pose_estimation_tpu.core.fast_infer import make_fast_infer
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg

    std = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = std.init(jax.random.key(0), x, False)
    a = np.asarray(make_fast_infer(tiny_cfg, pallas_layer1=False, interpret=True)(v, x))
    b = np.asarray(make_fast_infer(tiny_cfg, pallas_layer1=False, interpret=True,
                                   fuse_stem_layer1=True)(v, x))
    assert a.shape == b.shape == (2, 21, 2)
    np.testing.assert_allclose(a, b, atol=0.5)
