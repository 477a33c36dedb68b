"""PyTorch ``.pth.tar`` checkpoint -> flax variables converter.

The reference publishes HRNet checkpoints keyed by torch module paths
(lib/models/pose_hrnet*.py); this maps them onto our NHWC flax tree so the
published zoo runs on TPU unchanged.  Conversions:
- conv ``weight`` OIHW -> HWIO kernel
- BatchNorm ``weight/bias/running_mean/running_var`` ->
  params ``scale/bias`` + batch_stats ``mean/var``
- the ``module.`` DataParallel prefix is stripped (reference
  tools/train.py:163-171 does the same when resuming DP checkpoints).

Only numpy/regex at import time; torch is imported lazily inside
``load_torch_checkpoint`` so the TPU runtime never depends on it.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

# (regex on the torch name minus the trailing param field) -> flax path builder
_HRNET_RULES: Tuple[Tuple[str, object], ...] = (
    (r"^conv1$", lambda m: ("backbone", "stem1", "conv")),
    (r"^bn1$", lambda m: ("backbone", "stem1", "bn")),
    (r"^conv2$", lambda m: ("backbone", "stem2", "conv")),
    (r"^bn2$", lambda m: ("backbone", "stem2", "bn")),
    (r"^layer1\.(\d+)\.conv(\d)$", lambda m: ("backbone", "layer1", f"block{m[1]}", f"cb{m[2]}", "conv")),
    (r"^layer1\.(\d+)\.bn(\d)$", lambda m: ("backbone", "layer1", f"block{m[1]}", f"cb{m[2]}", "bn")),
    (r"^layer1\.(\d+)\.downsample\.0$", lambda m: ("backbone", "layer1", f"block{m[1]}", "downsample", "conv")),
    (r"^layer1\.(\d+)\.downsample\.1$", lambda m: ("backbone", "layer1", f"block{m[1]}", "downsample", "bn")),
    # transitions: existing-branch ConvBNReLU (3 segments) vs new-branch chain (4)
    (r"^transition(\d)\.(\d+)\.([01])$",
     lambda m: ("backbone", f"transition{m[1]}_{m[2]}", "conv" if m[3] == "0" else "bn")),
    (r"^transition(\d)\.(\d+)\.(\d+)\.([01])$",
     lambda m: ("backbone", f"transition{m[1]}_{m[2]}_{m[3]}", "conv" if m[4] == "0" else "bn")),
    # stage branches
    (r"^stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.conv(\d)$",
     lambda m: ("backbone", f"stage{m[1]}_m{m[2]}", f"branch{m[3]}", f"block{m[4]}", f"cb{m[5]}", "conv")),
    (r"^stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.bn(\d)$",
     lambda m: ("backbone", f"stage{m[1]}_m{m[2]}", f"branch{m[3]}", f"block{m[4]}", f"cb{m[5]}", "bn")),
    (r"^stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.([01])$",
     lambda m: ("backbone", f"stage{m[1]}_m{m[2]}", f"branch{m[3]}", f"block{m[4]}", "downsample",
                "conv" if m[5] == "0" else "bn")),
    # fuse layers: upsample path (j > i) has 2 sublayers, downsample chains 3
    (r"^stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.([01])$",
     lambda m: ("backbone", f"stage{m[1]}_m{m[2]}", f"fuse{m[3]}_{m[4]}",
                "conv" if m[5] == "0" else "bn")),
    (r"^stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.([01])$",
     lambda m: ("backbone", f"stage{m[1]}_m{m[2]}", f"fuse{m[3]}_{m[4]}_{m[5]}",
                "conv" if m[6] == "0" else "bn")),
    # head (reference last_layer Sequential: 0 conv, 1 bn, 2 relu, 3 conv)
    (r"^last_layer\.0$", lambda m: ("head_cb", "conv")),
    (r"^last_layer\.1$", lambda m: ("head_cb", "bn")),
    (r"^last_layer\.3$", lambda m: ("final_conv",)),
)

_PARAM_FIELD = {
    ("conv", "weight"): ("params", "kernel"),
    ("conv", "bias"): ("params", "bias"),
    ("bn", "weight"): ("params", "scale"),
    ("bn", "bias"): ("params", "bias"),
    ("bn", "running_mean"): ("batch_stats", "mean"),
    ("bn", "running_var"): ("batch_stats", "var"),
}


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_hrnet_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Convert a reference pose_hrnet(-softmax/-volumetric) state_dict.

    Returns ``{"params": ..., "batch_stats": ...}`` matching
    models/hrnet.py PoseHRNet's variable tree.
    """
    params: dict = {}
    stats: dict = {}
    unmatched = []
    for name, tensor in state.items():
        if name.startswith("module."):
            name = name[len("module."):]
        arr = np.asarray(tensor)
        if name == "trainable_temp":
            _set(params, ("trainable_temp",), arr.astype(np.float32))
            continue
        if "num_batches_tracked" in name:
            continue
        stem, _, field = name.rpartition(".")
        for pattern, builder in _HRNET_RULES:
            m = re.match(pattern, stem)
            if m:
                path = builder(m)
                kind = "bn" if path[-1] == "bn" else "conv"
                coll, leaf = _PARAM_FIELD[(kind, field)]
                if kind == "conv" and field == "weight":
                    arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                flax_path = path + (leaf,)
                if coll == "params":
                    _set(params, flax_path, arr.astype(np.float32))
                else:
                    _set(stats, flax_path, arr.astype(np.float32))
                break
        else:
            unmatched.append(name)
    if unmatched:
        raise KeyError(f"Unmatched torch parameters: {unmatched[:10]}"
                       f" (+{max(0, len(unmatched)-10)} more)")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth(.tar)`` file into a numpy state dict (CPU, lazy torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def convert_checkpoint(path: str) -> Dict[str, dict]:
    return convert_hrnet_state_dict(load_torch_checkpoint(path))
