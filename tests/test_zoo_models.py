"""Zoo coverage: CPM, pose_resnet, FTL, multiview fusion, registry names."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.models import build_model, registered_models
from hrnet_hand_pose_estimation_tpu.models.cpm import CPM
from hrnet_hand_pose_estimation_tpu.models.ftl import FTLMultiviewNet
from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg
from hrnet_hand_pose_estimation_tpu.models.multiview_hrnet import MultiViewPoseNet
from hrnet_hand_pose_estimation_tpu.models.pose_resnet import PoseResNet


def test_registry_covers_reference_names():
    names = registered_models()
    for required in [
        "pose_hrnet", "pose_hrnet_softmax", "pose_hrnet_volumetric",
        "pose_hrnet_trainable_softmax", "pose_resnet", "CPM", "FTL",
        "multiview_pose_hrnet", "alg", "ransac", "vol",
    ]:
        assert required in names, required


def test_cpm_stages():
    model = CPM(num_joints=21, dtype=jnp.float32)
    img = jnp.zeros((1, 128, 128, 3))
    center = jnp.zeros((1, 128, 128, 1))
    variables = model.init(jax.random.key(0), img, center, False)
    beliefs = model.apply(variables, img, center, False)
    assert len(beliefs) == 6
    for b in beliefs:
        assert b.shape == (1, 16, 16, 22)  # 128/8, K+1 channels


def test_pose_resnet_shapes():
    model = PoseResNet(num_layers=18, num_joints=21, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    out = model.apply(variables, x, False)
    # 64/32 backbone stride, x8 deconvs -> 16
    assert out.heatmaps.shape == (1, 16, 16, 21)


def test_ftl_forward(tiny_cfg):
    backbone = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32)
    model = FTLMultiviewNet(backbone=backbone, num_joints=21, num_views=2,
                            dtype=jnp.float32)
    # input 64 -> features 16x16 -> encoder head 9 -> 6; 36 % 3 == 0
    imgs = jnp.zeros((1, 2, 64, 64, 3))
    ext = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [500.0]])], 1)[None, None],
        (1, 2, 3, 4))
    K = jnp.asarray([[[50.0, 0, 8], [0, 50.0, 8], [0, 0, 1]]])
    variables = model.init(jax.random.key(0), imgs, ext, K, False)
    out = model.apply(variables, imgs, ext, K, False)
    assert out.keypoints_3d.shape == (1, 21, 3)
    assert out.keypoints_2d.shape == (1, 2, 21, 2)


def test_multiview_fusion_shapes(tiny_cfg):
    backbone = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32)
    model = MultiViewPoseNet(backbone=backbone, n_views=3, hm_size=16)
    views = jnp.zeros((2, 3, 64, 64, 3))
    variables = model.init(jax.random.key(0), views, False)
    out = model.apply(variables, views, False)
    assert out.fused_heatmaps.shape == (2, 3, 16, 16, 21)
    assert out.raw_heatmaps.shape == (2, 3, 16, 16, 21)


def test_aggregation_mixes_views(rng):
    """Fused view 0 must respond to other views' heatmap planes.

    (Driven at the Aggregation module: a fresh reference-init backbone emits
    exactly-uniform softmax heatmaps — normal(0.001) conv weights underflow —
    so input perturbations cannot reach the fusion from the image side.)
    """
    from hrnet_hand_pose_estimation_tpu.models.multiview_hrnet import Aggregation

    agg = Aggregation(n_views=3, hm_size=8)
    hms = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 4)).astype(np.float32))
    variables = agg.init(jax.random.key(0), hms)
    out = agg.apply(variables, hms)
    assert out.shape == hms.shape
    hms2 = hms.at[:, 1].add(1.0)
    out2 = agg.apply(variables, hms2)
    assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]))
    # identity-FC weights with the reference fuse weights recover 0.4*target
    # + 0.2 * sum(others)
    eye = jnp.broadcast_to(jnp.eye(64), (6, 64, 64))
    out3 = agg.apply({"params": {"pair_fc": eye}}, hms)
    want = 0.4 * hms[:, 0] + 0.2 * hms[:, 1] + 0.2 * hms[:, 2]
    np.testing.assert_allclose(np.asarray(out3[:, 0]), np.asarray(want), atol=1e-5)
