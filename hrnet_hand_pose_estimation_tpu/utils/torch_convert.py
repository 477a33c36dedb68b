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
    # GlobalAveragePoolingHead confidence heads of pose_hrnet_volumetric
    # (reference pose_hrnet_volumetric.py:22-57) -> models/hrnet.py
    # GlobalAveragePoolingHead ("confidence_head")
    (r"^(?:vol|alg)_confidences\.features\.([0145])$",
     lambda m: (("confidence_head", "cb1" if m[1] in "01" else "cb2",
                 "conv" if m[1] in "04" else "bn"), None)),
    (r"^(?:vol|alg)_confidences\.head\.([024])$",
     lambda m: (("confidence_head", f"fc{int(m[1]) // 2 + 1}"), "dense")),
)

_PARAM_FIELD = {
    ("conv", "weight"): ("params", "kernel"),
    ("conv", "bias"): ("params", "bias"),
    ("bn", "weight"): ("params", "scale"),
    ("bn", "bias"): ("params", "bias"),
    ("bn", "running_mean"): ("batch_stats", "mean"),
    ("bn", "running_var"): ("batch_stats", "var"),
}

# torch tensor -> flax leaf transforms per layer kind (empirically validated:
# ConvTranspose needs a spatial flip on top of the axis permutation because
# flax ConvTranspose runs a fractionally-strided REGULAR conv with the given
# kernel while torch computes the conv adjoint)
_WEIGHT_TRANSFORMS = {
    "conv": lambda a: a.transpose(2, 3, 1, 0),                     # OIHW->HWIO
    "conv3d": lambda a: a.transpose(2, 3, 4, 1, 0),                # OIDHW->DHWIO
    "deconv": lambda a: a.transpose(2, 3, 0, 1)[::-1, ::-1],       # IOHW->HWIO+flip
    "deconv3d": lambda a: a.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1],
    "dense": lambda a: a.T,                                        # (out,in)->(in,out)
    "bn": None,
}


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _resolve_hrnet(stem: str):
    """pose_hrnet(-softmax/-volumetric) torch module path -> (flax path, kind)."""
    for pattern, builder in _HRNET_RULES:
        m = re.match(pattern, stem)
        if m:
            out = builder(m)
            if isinstance(out[0], tuple):      # rule carries explicit kind
                path, kind = out
            else:
                path, kind = out, None
            if kind is None:
                kind = "bn" if path[-1] == "bn" else "conv"
            return path, kind
    return None


def _resolve_res3d(sub: str):
    """Reference Res3DBlock submodule -> (leaf module, kind)
    (v2v.py:20-42 -> models/v2v.py Res3D)."""
    return {
        "res_branch.0": ("conv1", "conv3d"), "res_branch.1": ("bn1", "bn"),
        "res_branch.3": ("conv2", "conv3d"), "res_branch.4": ("bn2", "bn"),
        "skip_con.0": ("skip_conv", "conv3d"), "skip_con.1": ("skip_bn", "bn"),
    }.get(sub)


def _resolve_v2v(stem: str):
    """Reference V2VModel torch path -> (flax path, kind)
    (v2v.py:69-169 -> models/v2v.py V2VModel)."""
    m = re.match(r"^front_layers\.0\.block\.([01])$", stem)
    if m:
        return ("front1", "conv" if m[1] == "0" else "bn"), \
            ("conv3d" if m[1] == "0" else "bn")
    m = re.match(r"^front_layers\.([123])\.(.+)$", stem)
    if m and _resolve_res3d(m[2]):
        leaf, kind = _resolve_res3d(m[2])
        return (f"front{int(m[1]) + 1}", leaf), kind
    m = re.match(r"^encoder_decoder\.(encoder_res|skip_res|decoder_res|mid_res)(\d?)\.(.+)$", stem)
    if m and _resolve_res3d(m[3]):
        leaf, kind = _resolve_res3d(m[3])
        name = {"encoder_res": f"enc{m[2]}", "skip_res": f"skip{m[2]}",
                "decoder_res": f"dec_res{m[2]}", "mid_res": "mid"}[m[1]]
        return (name, leaf), kind
    m = re.match(r"^encoder_decoder\.decoder_upsample(\d)\.block\.([01])$", stem)
    if m:
        return (f"dec_up{m[1]}", "deconv" if m[2] == "0" else "bn"), \
            ("deconv3d" if m[2] == "0" else "bn")
    m = re.match(r"^back_layers\.0\.(.+)$", stem)
    if m and _resolve_res3d(m[1]):
        leaf, kind = _resolve_res3d(m[1])
        return ("back1", leaf), kind
    m = re.match(r"^back_layers\.([12])\.block\.([01])$", stem)
    if m:
        return (f"back{int(m[1]) + 1}", "conv" if m[2] == "0" else "bn"), \
            ("conv3d" if m[2] == "0" else "bn")
    if stem == "output_layer":
        return ("out",), "conv3d"
    return None


def _resolve_volumetric(stem: str):
    """Reference VolumetricTriangulationNet (triangulation.py:277-470) ->
    models/triangulation.py VolumetricTriangulationNet tree."""
    if stem.startswith("backbone."):
        hit = _resolve_hrnet(stem[len("backbone."):])
        if hit:
            return ("backbone",) + hit[0], hit[1]
        return None
    if stem == "process_features.0":   # 1x1 conv 480->32 (:345-347)
        return ("process_features",), "conv"
    if stem.startswith("volume_net."):
        hit = _resolve_v2v(stem[len("volume_net."):])
        if hit:
            return ("volume_net",) + hit[0], hit[1]
    return None


def _resolve_cpm(stem: str):
    """Reference CPM (CPM.py:6-171) -> models/cpm.py CPM tree."""
    m = re.match(r"^conv([1-7])_stage1$", stem)
    if m:
        return (f"s1_conv{m[1]}",), "conv"
    m = re.match(r"^conv([123])_stage2$", stem)
    if m:   # shared trunk (reference _middle)
        return ("trunk", f"conv{m[1]}"), "conv"
    m = re.match(r"^conv4_stage2$", stem)
    if m:
        return ("stage2", "conv_feat"), "conv"
    m = re.match(r"^conv1_stage([3-6])$", stem)
    if m:
        return (f"stage{m[1]}", "conv_feat"), "conv"
    m = re.match(r"^Mconv([1-5])_stage([2-6])$", stem)
    if m:
        return (f"stage{m[2]}", f"mconv{m[1]}"), "conv"
    return None


def _resolve_pose_resnet(stem: str):
    """Reference pose_resnet (pose_resnet.py:103-271) -> models/pose_resnet.py."""
    if stem in ("conv1", "bn1"):
        return ("backbone", stem), ("bn" if stem == "bn1" else "conv")
    m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)$", stem)
    if m:
        return ("backbone", f"layer{m[1]}", f"block{m[2]}", f"cb{m[3]}", "conv"), "conv"
    m = re.match(r"^layer(\d)\.(\d+)\.bn(\d)$", stem)
    if m:
        return ("backbone", f"layer{m[1]}", f"block{m[2]}", f"cb{m[3]}", "bn"), "bn"
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.([01])$", stem)
    if m:
        return ("backbone", f"layer{m[1]}", f"block{m[2]}", "downsample",
                "conv" if m[3] == "0" else "bn"), \
            ("conv" if m[3] == "0" else "bn")
    m = re.match(r"^deconv_layers\.(\d+)$", stem)
    if m:
        i = int(m[1])
        if i % 3 == 0:
            return (f"deconv{i // 3}",), "deconv"
        if i % 3 == 1:
            return (f"deconv_bn{i // 3}",), "bn"
        return None
    if stem == "final_layer":
        return ("final_layer",), "conv"
    return None


_RESOLVERS = {
    "hrnet": _resolve_hrnet,
    "v2v": _resolve_v2v,
    "volumetric": _resolve_volumetric,
    "cpm": _resolve_cpm,
    "pose_resnet": _resolve_pose_resnet,
}


def _convert(state: Mapping[str, np.ndarray], resolver,
             strict: bool = True) -> Dict[str, dict]:
    params: dict = {}
    stats: dict = {}
    unmatched = []
    for name, tensor in state.items():
        if name.startswith("module."):
            name = name[len("module."):]
        arr = np.asarray(tensor)
        if name.endswith("trainable_temp"):
            path = tuple(name.split(".")[:-1]) + ("trainable_temp",)
            _set(params, path, arr.astype(np.float32))
            continue
        if "num_batches_tracked" in name:
            continue
        stem, _, field = name.rpartition(".")
        hit = resolver(stem)
        if hit is None:
            unmatched.append(name)
            continue
        path, kind = hit
        coll, leaf = _PARAM_FIELD[("bn" if kind == "bn" else "conv", field)]
        if field == "weight" and _WEIGHT_TRANSFORMS[kind] is not None:
            arr = _WEIGHT_TRANSFORMS[kind](arr)
        flax_path = path + (leaf,)
        if coll == "params":
            _set(params, flax_path, np.ascontiguousarray(arr).astype(np.float32))
        else:
            _set(stats, flax_path, arr.astype(np.float32))
    if unmatched and strict:
        raise KeyError(f"Unmatched torch parameters: {unmatched[:10]}"
                       f" (+{max(0, len(unmatched)-10)} more)")
    out = {"params": params, "batch_stats": stats}
    if not strict:
        out["unmatched"] = unmatched
    return out


def convert_hrnet_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Convert a reference pose_hrnet(-softmax/-volumetric) state_dict.

    Returns ``{"params": ..., "batch_stats": ...}`` matching
    models/hrnet.py PoseHRNet's variable tree.
    """
    return _convert(state, _resolve_hrnet)


def convert_v2v_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Convert a reference V2VModel state_dict (v2v.py:141-169)."""
    return _convert(state, _resolve_v2v)


def convert_volumetric_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Convert a reference VolumetricTriangulationNet checkpoint
    (backbone + process_features + V2V, triangulation.py:277-470)."""
    return _convert(state, _resolve_volumetric)


def convert_cpm_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Convert a reference CPM checkpoint (CPM.py:6-171)."""
    return _convert(state, _resolve_cpm)


def convert_pose_resnet_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Convert a reference pose_resnet checkpoint (pose_resnet.py:103-271)."""
    return _convert(state, _resolve_pose_resnet)


def convert_state_dict(state: Mapping[str, np.ndarray],
                       model_name: str) -> Dict[str, dict]:
    """Dispatch on the reference MODEL.NAME / architecture family."""
    name = model_name.lower()
    if "hrnet" in name:
        return convert_hrnet_state_dict(state)
    if name in ("vol", "vol_cpm", "volumetrictriangulationnet", "volumetric"):
        return convert_volumetric_state_dict(state)
    if "resnet" in name:
        return convert_pose_resnet_state_dict(state)
    if "cpm" in name:
        return convert_cpm_state_dict(state)
    if "v2v" in name:
        return convert_v2v_state_dict(state)
    raise KeyError(f"No converter for model family {model_name!r}")


def convert_pretrained_trunk(state: Mapping[str, np.ndarray],
                             layers=("*",)) -> Dict[str, dict]:
    """Tolerant trunk conversion for warm-starts (reference ``init_weights``,
    pose_hrnet.py:560-585 + MODEL.PRETRAINED via get_pose_net).

    Mirrors the reference semantics exactly: keep only torch entries whose
    first module-path component is listed in ``layers`` (or ``'*'`` passes
    everything), then convert what the HRNet resolver recognises and report
    the rest under ``"unmatched"`` instead of raising — an ImageNet
    classification HRNet checkpoint carries classifier/incre heads the pose
    trunk never had (the reference's ``strict=False`` load tolerance).
    """
    layers = tuple(layers)
    keep = {}
    for name, tensor in state.items():
        base = name[len("module."):] if name.startswith("module.") else name
        if "*" in layers or base.split(".")[0] in layers:
            keep[name] = tensor
    return _convert(keep, _resolve_hrnet, strict=False)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth(.tar)`` file into a numpy state dict (CPU, lazy torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def convert_checkpoint(path: str) -> Dict[str, dict]:
    return convert_hrnet_state_dict(load_torch_checkpoint(path))
