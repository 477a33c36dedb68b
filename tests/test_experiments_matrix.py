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
