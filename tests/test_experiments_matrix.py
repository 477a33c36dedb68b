"""Every vendored experiment YAML must build its full training assembly.

The reference ships 67 experiment definitions under ``experiments/``
(reference experiments/<Dataset>/*.yaml); this repo vendors all of them.
For each one we build the model, the loss computer, the optimizer, and
synthetic-stubbed dataloaders (no datasets exist in this image, so every
dataset name is mapped to its synthetic stand-in of the same protocol
shape — single-view keypoints or multi-view).
"""

import glob
import os

import pytest

from hrnet_hand_pose_estimation_tpu.config import load_config
from hrnet_hand_pose_estimation_tpu.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VENDORED = sorted(glob.glob(os.path.join(REPO, "experiments", "**", "*.yaml"),
                            recursive=True))

MODELS_3D = {"alg", "ransac", "vol", "vol_CPM", "FTL"}


def _synthetic_name(name: str) -> str:
    return "Synthetic_mv" if ("_mv" in name or "_seq" in name) else "Synthetic_kpt"


def test_experiment_matrix_vendored():
    # 67 reference experiments + the synthetic smoke configs
    assert len(VENDORED) >= 67 + 3


@pytest.mark.parametrize(
    "path", VENDORED,
    ids=[os.path.relpath(p, os.path.join(REPO, "experiments")) for p in VENDORED])
def test_experiment_builds(path):
    cfg = load_config(path, freeze=False)
    cfg.DATASET.DATASET = [_synthetic_name(n) for n in cfg.DATASET.DATASET]
    cfg.DATASET.TEST_DATASET = [_synthetic_name(n) for n in cfg.DATASET.TEST_DATASET]
    cfg.WORKERS = 0
    cfg = cfg.freeze()

    model = build_model(cfg)
    assert model is not None

    from hrnet_hand_pose_estimation_tpu.core.loss_computer import (
        LossComputer2D, LossComputer3D)
    if cfg.MODEL.NAME in MODELS_3D:
        losses = LossComputer3D(cfg)
    else:
        losses = LossComputer2D(cfg)
    assert losses is not None

    from hrnet_hand_pose_estimation_tpu.parallel.train_step import make_optimizer
    tx = make_optimizer(cfg)
    assert tx is not None

    from hrnet_hand_pose_estimation_tpu.data.build import make_dataloader
    loaders = make_dataloader(cfg, is_train=True, n_devices=1)
    assert loaders and all(len(dl.dataset) > 0 for dl in loaders.values())


def _example_inputs(cfg, rng):
    """Per-family example inputs matching the model's apply signature, at
    the reduced spatial size already written into cfg."""
    import numpy as np

    w, h = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
    name = str(cfg.MODEL.NAME)
    img = np.asarray(rng.normal(size=(1, h, w, 3)), np.float32)
    if name == "CPM":
        return (img, np.zeros((1, h, w, 1), np.float32)), {}
    if name in MODELS_3D:
        n_views = 2 if name != "FTL" else 4
        imgs = np.asarray(rng.normal(size=(1, n_views, h, w, 3)), np.float32)
        K = np.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                     np.float32)
        # plausible pinhole cameras looking at the origin from z=-600
        E = np.tile(np.eye(3, 4, dtype=np.float32), (1, n_views, 1, 1))
        for v in range(n_views):
            E[0, v, :, 3] = [10.0 * v, 0.0, 600.0]
        if name == "FTL":
            # FTLMultiviewNet(images, extrinsics, intrinsics)
            return (imgs, E, K[None]), {}
        proj = (K[None, None] @ E).astype(np.float32)
        return (imgs, proj), {"rngs": True}
    if name == "multiview_pose_hrnet":
        return (np.asarray(rng.normal(size=(1, 4, h, w, 3)), np.float32),), {}
    if name in ("pose_hrnet_PoseAggr", "pose_hrnet_transformer"):
        n_frames = len(list(cfg.DATASET.SEQ_IDX)) or 3
        return (np.asarray(rng.normal(size=(1, n_frames, h, w, 3)),
                           np.float32),), {}
    return (img,), {}


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", VENDORED,
    ids=[os.path.relpath(p, os.path.join(REPO, "experiments")) for p in VENDORED])
def test_experiment_inits_and_forwards(path):
    """Every experiment's MODEL.EXTRA wiring must survive init + one forward
    at reduced spatial size (the reference contract is
    eval(cfg.MODEL.NAME+'.get_pose_net') actually running per config,
    reference tools/train.py:152).  Stage/EXTRA specs are kept; only the
    image/heatmap resolution and volumetric grid are shrunk."""
    import jax
    import numpy as np

    cfg = load_config(path, freeze=False)
    stride = int(cfg.MODEL.IMAGE_SIZE[0]) // int(cfg.MODEL.HEATMAP_SIZE[0])
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [64 // max(stride, 1)] * 2
    cfg.MODEL.VOLUME_SIZE = 8
    cfg = cfg.freeze()

    model = build_model(cfg)
    args, opts = _example_inputs(cfg, np.random.default_rng(0))
    rngs = ({"params": jax.random.key(0), "aug": jax.random.key(1)}
            if opts.get("rngs") else jax.random.key(0))
    variables = model.init(rngs, *args, False)
    out = model.apply(variables, *args, False,
                      rngs={"aug": jax.random.key(2)} if opts.get("rngs") else None)
    # every family returns either a struct with .heatmaps / .keypoints_3d,
    # a list of belief maps (CPM), or a coords array — just require finite
    leaves = [np.asarray(l) for l in jax.tree.leaves(out)
              if hasattr(l, "dtype") and np.issubdtype(np.asarray(l).dtype,
                                                       np.floating)]
    assert leaves and all(np.isfinite(l).all() for l in leaves)
