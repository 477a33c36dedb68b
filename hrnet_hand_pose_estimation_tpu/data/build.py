"""Dataset factory: string names -> loaders, multi-dataset training dict.

Replaces reference lib/dataset/build.py:32-129.  The reference resolves
dataset names with ``eval``; here an explicit registry maps every name the
69 experiment YAMLs use.  ``make_dataloader`` returns a {name: DataLoader}
dict to support joint multi-dataset training exactly like the reference
(build.py:66-97); batch = TRAIN.IMAGES_PER_GPU * n_devices (the reference
multiplies by len(GPUS), build.py:90).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from ..ops.targets import gaussian_targets_np
from .pipeline import DataLoader
from .transforms import build_transforms


class HeatmapGeneratorFn:
    """Callable target generator bound to (res, sigma) — the role of the
    reference HeatmapGenerator instance (target_generators.py:15-53), but
    calling the vectorised stamping op."""

    def __init__(self, output_res: int, num_joints: int = 21, sigma: float = -1):
        self.output_res = int(output_res)
        self.num_joints = num_joints
        self.sigma = float(sigma) if sigma > 0 else self.output_res / 64 * 2.0

    def __call__(self, joints: np.ndarray, visibility: Optional[np.ndarray] = None):
        if visibility is None:  # reference packs vis as the 3rd joint column
            visibility = joints[:, 2] if joints.shape[1] > 2 else np.ones(len(joints))
        return gaussian_targets_np(joints[:, :2], visibility, self.output_res, self.sigma)


_DATASETS: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(fn):
        _DATASETS[name] = fn
        return fn
    return deco


def _lazy_registry() -> Dict[str, Callable]:
    if _DATASETS:
        return _DATASETS
    from .coco_mpii import COCOKeypointsDataset, MPIIDataset
    from .fha import FHADatasetKeypoints
    from .freihand import FreiHandDataset, FreiHandDatasetKeypoints
    from .handgraph import HandGraphDatasetKeypoints
    from .mhp import (
        MHPCPMDataset,
        MHPCPMMultiViewDataset,
        MHPDataset,
        MHPDatasetKeypoints,
        MHPMultiViewDataset,
        MHPSeqDataset,
    )
    from .rhd import (RHDDataset, RHDDatasetKeypoints,
                      RHDFullFrameDataset, RHDFullFrameDatasetKeypoints)
    from .stb import STBDataset
    from .synthetic import SyntheticDataset, SyntheticMultiViewDataset

    def raw(cls):
        # raw (non-keypoint) datasets take (root, subset, fmt, transforms)
        def build(cfg, subset, hm_gen, transforms):
            return cls(cfg.DATA_DIR, subset, cfg.DATASET.DATA_FORMAT, transforms)
        return build

    _DATASETS.update({
        # keypoint datasets (cfg, subset, heatmap_generator, transforms)
        "RHD_kpt": RHDDatasetKeypoints,
        # full-frame variant (reference *_twohands readers' live path)
        "RHD_twohands_kpt": RHDFullFrameDatasetKeypoints,
        "RHD_fullframe_kpt": RHDFullFrameDatasetKeypoints,
        "Frei_kpt": FreiHandDatasetKeypoints,
        "FreiHand_kpt": FreiHandDatasetKeypoints,
        "MHP_kpt": MHPDatasetKeypoints,
        "HandGraph_kpt": HandGraphDatasetKeypoints,
        "FHA_kpt": FHADatasetKeypoints,
        "Synthetic_kpt": SyntheticDataset,
        # CPM variants: (K+1)-channel bg targets + centre maps
        # (reference dataset/__init__.py:29-30)
        "MHP_CPM_kpt": MHPCPMDataset,
        "MHP_CPM_mv": MHPCPMMultiViewDataset,
        # multi-view / sequence (cfg, subset, heatmap_generator, transform)
        "MHP_mv": MHPMultiViewDataset,
        "MHP_seq": MHPSeqDataset,
        "Synthetic_mv": SyntheticMultiViewDataset,
        # upstream human-pose datasets (VEST tier; reference coco.py/mpii.py)
        "COCO": lambda cfg, subset, hm, tr: COCOKeypointsDataset(
            cfg.DATA_DIR, subset, tr, int(cfg.MODEL.HEATMAP_SIZE[0]),
            float(cfg.MODEL.SIGMA)),
        "MPII": lambda cfg, subset, hm, tr: MPIIDataset(
            cfg.DATA_DIR, subset, tr, int(cfg.MODEL.HEATMAP_SIZE[0]),
            float(cfg.MODEL.SIGMA)),
        # raw eval datasets (reference evaluate_2D.py uses the non-kpt class)
        "RHD": raw(RHDDataset),
        "RHD_twohands": raw(RHDFullFrameDataset),
        "Frei": raw(FreiHandDataset),
        "FreiHand": raw(FreiHandDataset),
        "MHP": raw(MHPDataset),
        # reference PanopticDataset.py:22 is a verbatim copy of the MHP
        # class (still named MHPDataset inside); alias, not a port
        "Panoptic": raw(MHPDataset),
        "Panoptic_kpt": MHPDatasetKeypoints,
        "STB": raw(STBDataset),
        "Synthetic": lambda cfg, subset, hm, tr: SyntheticDataset(cfg, subset, hm, tr),
    })
    return _DATASETS


def build_dataset(cfg, name: str, is_train: bool):
    """One dataset by name (reference build.py:32-63)."""
    registry = _lazy_registry()
    if name not in registry:
        raise KeyError(f"Unknown dataset {name!r}. Registered: {sorted(registry)}")
    subset = cfg.DATASET.TRAIN_SET if is_train else cfg.DATASET.TEST_SET
    transforms = build_transforms(cfg, is_train=is_train)
    hm_gen = HeatmapGeneratorFn(int(cfg.MODEL.HEATMAP_SIZE[0]),
                                int(cfg.DATASET.NUM_JOINTS),
                                float(cfg.MODEL.SIGMA))
    return registry[name](cfg, subset, hm_gen, transforms)


def make_dataloader(cfg, is_train: bool = True, distributed: bool = False,
                    n_devices: Optional[int] = None) -> Dict[str, DataLoader]:
    """{name: DataLoader} dict for joint multi-dataset training
    (reference build.py:66-97)."""
    if n_devices is None:
        import jax

        n_devices = jax.local_device_count()
    per_dev = int(cfg.TRAIN.IMAGES_PER_GPU if is_train else cfg.TEST.IMAGES_PER_GPU)
    batch = per_dev * max(1, n_devices)
    names = list(cfg.DATASET.DATASET if is_train else cfg.DATASET.TEST_DATASET)
    loaders = {}
    for name in names:
        ds = build_dataset(cfg, name, is_train)
        loaders[name] = DataLoader(
            ds, batch_size=batch,
            shuffle=bool(cfg.TRAIN.SHUFFLE) and is_train,
            drop_last=is_train,
            num_workers=int(cfg.WORKERS),
            seed=int(cfg.TPU.SEED) if "TPU" in cfg else 0,
        )
    return loaders


def make_test_dataloader(cfg, n_devices: Optional[int] = None) -> Dict[str, DataLoader]:
    """Test loaders (reference build.py:100-129)."""
    return make_dataloader(cfg, is_train=False, n_devices=n_devices)
