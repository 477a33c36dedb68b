"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-device strategy from SURVEY.md section 4: the reference's
only multi-device test simulated distribution with single-process
DataParallel; here every test sees 8 XLA host devices so mesh/pjit paths are
exercised for real (collectives included) without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Force CPU: this environment's axon sitecustomize re-registers the tunneled
# TPU backend and overrides the JAX_PLATFORMS env var, so the config flag is
# the only reliable switch.  Tests must not ride the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# f32 matmuls/convs at full precision: parity tests compare against torch.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite is compile-bound (tiny-HRNet and
# triangulation graphs take 10-170s to build); repeat runs hit the cache and
# the fast subset drops to minutes.  Repo-local by default so it survives
# the /tmp wipes between builder sessions.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE", os.path.join(
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax_test_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    """A miniature HRNet config (2 branches, 1 module each) for fast tests."""
    from hrnet_hand_pose_estimation_tpu.config import load_config

    cfg = load_config(freeze=False)
    cfg.MODEL.NAME = "pose_hrnet_softmax"
    cfg.MODEL.NUM_JOINTS = 21
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.TRAINABLE_SOFTMAX = True
    cfg.MODEL.HEATMAP_SOFTMAX = True
    cfg.MODEL.EXTRA.merge_from_mapping(dict(
        FINAL_CONV_KERNEL=1,
        STAGE2=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                    NUM_BLOCKS=[1, 1], NUM_CHANNELS=[8, 16], FUSE_METHOD="SUM"),
        STAGE3=dict(NUM_MODULES=1, NUM_BRANCHES=3, BLOCK="BASIC",
                    NUM_BLOCKS=[1, 1, 1], NUM_CHANNELS=[8, 16, 32], FUSE_METHOD="SUM"),
        STAGE4=dict(NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
                    NUM_BLOCKS=[1, 1, 1, 1], NUM_CHANNELS=[8, 16, 32, 64], FUSE_METHOD="SUM"),
    ))
    cfg.LOSS.WITH_POSE2D_LOSS = True
    cfg.LOSS.WITH_HEATMAP_LOSS = True
    cfg.TRAIN.IMAGES_PER_GPU = 2
    return cfg.freeze()
