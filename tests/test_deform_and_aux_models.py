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


def test_grouped_deform_matches_single_group(rng):
    """deformable_groups=G with identical per-group offsets == G=1
    (reference DeformConv semantics, deformable_conv/functions)."""
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 6, 4)).astype(np.float32))
    off1 = jnp.asarray(rng.normal(scale=0.4, size=(2, 10, 10, 18)).astype(np.float32))
    offg = jnp.tile(off1[..., None, :], (1, 1, 1, 3, 1)).reshape(2, 10, 10, 54)
    a = deform_conv2d(x, off1, w, padding=1)
    b = deform_conv2d(x, offg, w, padding=1, deformable_groups=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grouped_zero_offset_equals_conv(rng):
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 5)).astype(np.float32))
    off = jnp.zeros((1, 12, 12, 4 * 18))
    got = deform_conv2d(x, off, w, padding=1, deformable_groups=4)
    want = plain_conv2d_reference(x, w, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.slow
def test_grouped_offset_gradcheck():
    """Numeric gradient through the grouped warp (mirrors
    deformable_conv/test.py:375 check_gradient_dconv).  Hermetic rng (the
    shared session fixture's stream depends on which tests ran before);
    eps=1e-2 keeps the central difference well above f32 cancellation noise
    in the big sum-of-squares while staying inside one bilinear cell
    (offsets 0.3 +- 0.01 cross no integer coordinate, so the objective is
    exactly linear over the probe interval)."""
    local = np.random.default_rng(42)
    x = jnp.asarray(local.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(local.normal(size=(3, 3, 4, 2)).astype(np.float32))
    off0 = jnp.full((1, 8, 8, 2 * 18), 0.3)

    f = lambda off: jnp.sum(deform_conv2d(x, off, w, padding=1,
                                          deformable_groups=2) ** 2)
    g = jax.grad(f)(off0)
    idx = (0, 4, 4, 7)
    eps = 1e-2
    num = (float(f(off0.at[idx].add(eps))) - float(f(off0.at[idx].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), num, rtol=2e-2, atol=1e-3)


# ------------------------------------------------------------- aux models
@pytest.mark.slow
def test_pose_aggr_forward(tiny_cfg):
    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.pose_aggr import PoseAggrNet

    model = PoseAggrNet(
        backbone=hrnet_from_cfg(tiny_cfg, head="plain", dtype=jnp.float32),
        seq_len=3, num_joints=21, dilation_rates=(1, 2),
        offset_blocks=2, dtype=jnp.float32)
    frames = jnp.zeros((1, 3, 64, 64, 3))
    variables = model.init(jax.random.key(0), frames, False)
    out = model.apply(variables, frames, False)
    assert out.heatmaps.shape == (1, 16, 16, 21)
    # reference structure present: shared offset chain, 2 offset heads,
    # per-dilation deform kernels, trainable temperature
    p = variables["params"]
    assert "offset_feats" in p and "offsets1" in p and "offsets2" in p
    assert p["deform_kernel1"].shape == (3, 3, 21, 21)
    # softmax output: every joint plane sums to 1
    sums = np.asarray(out.heatmaps.sum(axis=(1, 2)))
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_deform_warp_undoes_translation(rng):
    """Mechanism check for the PoseAggr warp (reference :616-638): with an
    identity centre-tap kernel and constant offsets equal to a known
    inter-frame shift, the warped support heatmap recovers the centre's."""
    k = 3
    base = np.zeros((1, 16, 16, k), np.float32)
    base[0, 5:8, 6:9, :] = rng.uniform(0.5, 1.0, size=(3, 3, k))
    shift = 3
    moved = np.roll(base, shift, axis=2)       # support frame: shifted right

    w = np.zeros((3, 3, k, k), np.float32)
    for c in range(k):
        w[1, 1, c, c] = 1.0                    # identity centre tap
    off = np.zeros((1, 16, 16, k, 9, 2), np.float32)
    off[..., 1] = shift                        # dx = +shift for every tap
    got = deform_conv2d(jnp.asarray(moved), jnp.asarray(off.reshape(1, 16, 16, -1)),
                        jnp.asarray(w), padding=1, deformable_groups=k)
    # warping the shifted frame by +shift recovers the original (interior)
    np.testing.assert_allclose(np.asarray(got)[0, :, : -shift - 1],
                               base[0, :, : -shift - 1], atol=1e-5)


@pytest.mark.slow
def test_pose_aggr_training_improves_on_motion(tiny_cfg):
    """VERDICT r1 #6 'done' criterion: a short training run on a synthetic
    motion sequence must reduce the centre-frame pose loss, i.e. gradients
    flow through offset heads + grouped warps end-to-end."""
    import optax

    from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
    from hrnet_hand_pose_estimation_tpu.models.pose_aggr import PoseAggrNet
    from hrnet_hand_pose_estimation_tpu.ops.decode import decode_heatmaps

    model = PoseAggrNet(
        backbone=hrnet_from_cfg(tiny_cfg, head="plain", dtype=jnp.float32),
        seq_len=3, num_joints=21, dilation_rates=(1, 2),
        offset_blocks=2, trainable_softmax=True, dtype=jnp.float32)

    rng_np = np.random.default_rng(0)
    frames = np.zeros((2, 3, 64, 64, 3), np.float32)
    gt = np.zeros((2, 21, 2), np.float32)
    for b in range(2):
        cx, cy = rng_np.uniform(20, 40, 2)
        for t in range(3):
            # a bright blob translating across frames
            x0, y0 = int(cx + 4 * (t - 1)), int(cy)
            frames[b, t, y0 - 3:y0 + 3, x0 - 3:x0 + 3, :] = 1.0
        gt[b, :, 0] = (cx / 4.0)
        gt[b, :, 1] = (cy / 4.0)
    frames_j, gt_j = jnp.asarray(frames), jnp.asarray(gt)

    variables = model.init(jax.random.key(0), frames_j, False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(params, stats):
        out, updates = model.apply(
            {"params": params, "batch_stats": stats}, frames_j, True,
            mutable=["batch_stats"])
        pose = decode_heatmaps(out.heatmaps, True)
        return jnp.mean(jnp.sum((pose - gt_j) ** 2, axis=-1)), updates

    @jax.jit
    def step(params, stats, opt_state):
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), updates["batch_stats"], \
            opt_state, loss

    losses = []
    for _ in range(40):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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
