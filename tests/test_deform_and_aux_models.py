"""Deformable conv parity + auxiliary model-zoo forward tests.

The deform-conv tests mirror the structure of the reference extension's own
unit suite (lib/deformable_conv/test.py): zero-offset equivalence to plain
convolution, mask behaviour, and gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.ops.deform_conv import (
    deform_conv2d,
    plain_conv2d_reference,
)


# -------------------------------------------------------- deformable conv
def test_zero_offset_equals_conv(rng):
    """check_dconv_zero_offset (reference deformable_conv/test.py:36)."""
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 8)).astype(np.float32))
    off = jnp.zeros((2, 12, 12, 18))
    got = deform_conv2d(x, off, w, padding=1)
    want = plain_conv2d_reference(x, w, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_zero_offset_stride_dilation(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 5)).astype(np.float32))
    for stride, pad, dil, ho in [(2, 1, 1, 8), (1, 2, 2, 16)]:
        off = jnp.zeros((1, ho, ho, 18))
        got = deform_conv2d(x, off, w, stride=stride, padding=pad, dilation=dil)
        want = plain_conv2d_reference(x, w, stride=stride, padding=pad, dilation=dil)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_integer_offset_shifts_sampling(rng):
    """Offset (0, +1) on every tap == sampling the input shifted left."""
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))
    off = jnp.zeros((1, 10, 10, 9, 2)).at[..., 1].set(1.0).reshape(1, 10, 10, 18)
    got = deform_conv2d(x, off, w, padding=1)
    x_shift = jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)
    want = plain_conv2d_reference(x_shift, w, padding=1)
    # interior matches exactly; borders differ (shift wraps zeros differently)
    np.testing.assert_allclose(np.asarray(got)[:, 2:-2, 2:-2],
                               np.asarray(want)[:, 2:-2, 2:-2], atol=1e-4)


def test_ones_mask_matches_v1(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    off = jnp.asarray(rng.normal(scale=0.5, size=(1, 8, 8, 18)).astype(np.float32))
    v1 = deform_conv2d(x, off, w, padding=1)
    v2 = deform_conv2d(x, off, w, mask=jnp.ones((1, 8, 8, 9)), padding=1)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_gradients_flow_to_offsets(rng):
    """The extension gradchecks offset gradients (test.py:375); here:
    nonzero offset grads through the bilinear sampling."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)).astype(np.float32))
    off0 = jnp.full((1, 8, 8, 18), 0.3)

    g = jax.grad(lambda off: jnp.sum(deform_conv2d(x, off, w, padding=1) ** 2))(off0)
    assert float(jnp.abs(g).max()) > 0

    # finite-difference check on one offset element
    idx = (0, 4, 4, 3)
    eps = 1e-3
    f = lambda off: float(jnp.sum(deform_conv2d(x, off, w, padding=1) ** 2))
    num = (f(off0.at[idx].add(eps)) - f(off0.at[idx].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), num, rtol=2e-2, atol=1e-3)


# ------------------------------------------------------------- aux models
def test_pose_aggr_forward(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.pose_aggr import PoseAggrNet

    model = PoseAggrNet(
        backbone=hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32),
        seq_len=3, num_joints=21, dilation_rates=(1, 2), dtype=jnp.float32)
    frames = jnp.zeros((1, 3, 64, 64, 3))
    variables = model.init(jax.random.key(0), frames, False)
    out = model.apply(variables, frames, False)
    assert out.heatmaps.shape == (1, 16, 16, 21)


def test_pose_transformer_forward(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.transformers import PoseTransformer

    model = PoseTransformer(
        backbone=hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32),
        num_frames=3, num_joints=21)
    frames = jnp.zeros((2, 3, 64, 64, 3))
    variables = model.init(jax.random.key(0), frames, False)
    out = model.apply(variables, frames, False)
    assert out.pose2d_refined.shape == (2, 21, 2)


def test_pooling_transformer_forward():
    from hrnet_hand_pose_estimation_tpu.models.transformers import PoolingTransformer

    model = PoolingTransformer(num_joints=21, backbone_layers=18,
                               base_dims=(16, 16), depths=(1, 1), num_heads=(2, 4),
                               heatmap_size=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    uv = model.apply(variables, x, False)
    assert uv.shape == (1, 21, 2)
    assert np.all(np.asarray(uv) >= 0) and np.all(np.asarray(uv) <= 16)


def test_predrnn_forward(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.temporal import HRNetPredRNN

    model = HRNetPredRNN(
        backbone=hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32),
        num_hidden=(8, 8), num_joints=21)
    frames = jnp.zeros((1, 3, 64, 64, 3))
    variables = model.init(jax.random.key(0), frames, False)
    refined, raw, pose = model.apply(variables, frames, False)
    assert refined.shape == (1, 3, 16, 16, 21)
    assert pose.shape == (1, 3, 21, 2)


def test_tcn_forward(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.temporal import HRNetEmbTCN

    model = HRNetEmbTCN(
        backbone=hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32),
        embedding_size=32, tcn_channels=64, filter_widths=(3,), num_joints=21)
    frames = jnp.zeros((1, 3, 64, 64, 3))
    variables = model.init(jax.random.key(0), frames, False)
    uv = model.apply(variables, frames, False)
    assert uv.shape == (1, 21, 2)


def test_hamburger_forward(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hamburger import hamburger_from_cfg

    cfg = tiny_cfg.clone().defrost()
    cfg.MODEL.R = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    model = hamburger_from_cfg(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    out = model.apply(variables, x, False)
    assert out.heatmaps.shape == (1, 16, 16, 21)
    np.testing.assert_allclose(np.asarray(out.heatmaps).sum(axis=(1, 2)), 1.0,
                               atol=1e-4)
