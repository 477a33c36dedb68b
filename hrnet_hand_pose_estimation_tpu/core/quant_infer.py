"""int8 W8A8 serving path for the HRNet trunk (stages 2-4).

TPU v5e runs int8 MXU matmuls at 2x the bf16 rate; stage3/4 conv time is
where the remaining fps gap lives (PERF.md).  This module quantizes the
stage convs — the 3x3 BasicBlock branch chains (~80% of stage FLOPs) plus,
in the shipped 'exchange' scope, the transition and exchange-fusion convs
— to W8A8 and keeps everything precision-sensitive (stem, head; layer1 is
served by its own W8A8 Pallas chain) in bf16:

- weights: BN-folded then symmetric per-output-channel int8
  (``scale[c] = max|k'[..., c]| / 127``)
- activations: symmetric per-tensor int8 with calibrated scales.  Every
  quantized conv input is post-ReLU (non-negative), so the int8 range is
  effectively [0, 127].
- conv: int8 x int8 -> int32 accumulate on the MXU
  (``preferred_element_type=int32``), dequantized into the f32 bias/ReLU
  epilogue XLA fuses anyway.

The functional stage walk mirrors ``models/hrnet.py HRNetBackbone``
(reference topology lib/models/pose_hrnet.py:275-528) parameter-key for
parameter-key; ``test_quant_infer.py`` pins parity between this walk in
f32 mode and the Flax module, and gates the int8 path at < 0.1 px decoded
drift.

On top of the quantized walk, the shipped serving configuration
(``prepare_serving_qparams``) adds: the W8A8 Pallas layer1 chain
(``ops/pallas/int8_chain.py``, LAYER1_CHAIN_KEY), W8A8 stem2, optional
int8 head inputs (HEAD_SCALES_KEY), raw-uint8 device-side normalization
(``input_norm=``) and data-parallel scale-out over a mesh (``mesh=``,
shard_map).

Usage:
    amax = calibrate(cfg, variables, [batch1, batch2, ...])
    qparams = prepare_serving_qparams(cfg, variables, amax)
    fn = make_quant_infer(cfg)                 # jitted
    coords = fn(variables, qparams, images)
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hrnet import StageCfg
from ..models.layers import BN_EPS

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _fold(cb_params, cb_stats) -> Tuple[jax.Array, jax.Array]:
    """BN-folded (kernel, bias) for a ConvBN block (eval semantics, exact)."""
    inv = cb_params["bn"]["scale"] / jnp.sqrt(cb_stats["bn"]["var"] + BN_EPS)
    kernel = cb_params["conv"]["kernel"] * inv
    bias = cb_params["bn"]["bias"] - cb_stats["bn"]["mean"] * inv
    if "bias" in cb_params["conv"]:
        bias = bias + cb_params["conv"]["bias"] * inv
    return kernel, bias


def _conv_bf16(x, kernel, bias, stride=1, relu=True, dtype=jnp.bfloat16):
    kh = kernel.shape[0]
    pad = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(dtype)
    return jnp.maximum(y, 0) if relu else y


def _conv_int8(x, q, stride=1, relu=True):
    """W8A8 conv: x (bf16) vs prepared ``q`` = {kq, wscale, sa, bias}."""
    sa = q["sa"]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sa), -127, 127
                  ).astype(jnp.int8)
    kh = q["kq"].shape[0]
    pad = (kh - 1) // 2
    acc = jax.lax.conv_general_dilated(
        xq, q["kq"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sa * q["wscale"]) + q["bias"]
    y = jnp.maximum(y, 0.0) if relu else y
    return y.astype(jnp.bfloat16)


def stage_cfgs(cfg) -> Tuple[StageCfg, StageCfg, StageCfg]:
    extra = cfg.MODEL.EXTRA
    return (StageCfg.from_cfg(extra["STAGE2"]),
            StageCfg.from_cfg(extra["STAGE3"]),
            StageCfg.from_cfg(extra["STAGE4"]))


# --------------------------------------------------------------------------
# functional stage walk (mirrors HRNetBackbone stages 2-4)
# --------------------------------------------------------------------------

class _Walk:
    """One pass over stages 2-4.

    mode 'f32'      — folded-conv reference walk (parity vs the Flax module)
    mode 'calibrate'— like f32 but records per-site input amax into .amax
    mode 'quant'    — branch convs via int8 (qparams), the rest bf16
    """

    def __init__(self, params: Params, stats: Params, mode: str,
                 qparams: Params | None = None, dtype=jnp.bfloat16):
        self.p = params
        self.s = stats
        self.mode = mode
        self.q = qparams or {}
        self.dtype = dtype
        self.amax: Dict[str, jax.Array] = {}

    def _site(self, path: Sequence[str]) -> str:
        return "/".join(path)

    def conv(self, x, path, stride=1, relu=True, quantized=False):
        """One ConvBN site.  Which sites actually run int8 is decided
        OFFLINE by ``prepare_quant_params``'s scope — membership in
        ``self.q`` is the only runtime switch (``quantized`` is kept for
        call-site documentation of the conservative 'branch' scope)."""
        node_p, node_s = self.p, self.s
        for k in path:
            node_p, node_s = node_p[k], node_s[k]
        site = self._site(path)
        if self.mode == "calibrate":
            m = jnp.max(jnp.abs(x)).astype(jnp.float32)
            self.amax[site] = jnp.maximum(self.amax.get(site, 0.0), m)
        if self.mode == "quant" and site in self.q:
            return _conv_int8(x, self.q[site], stride=stride, relu=relu)
        kernel, bias = _fold(node_p, node_s)
        return _conv_bf16(x, kernel, bias, stride=stride, relu=relu,
                          dtype=self.dtype)

    # -- layer1: 4 bottleneck blocks at 64x64 (reference pose_hrnet.py:292)
    def layer1(self, x):
        for b in range(4):
            base = ("layer1", f"block{b}")
            y = self.conv(x, base + ("cb1",), relu=True, quantized=True)
            y = self.conv(y, base + ("cb2",), relu=True, quantized=True)
            y = self.conv(y, base + ("cb3",), relu=False, quantized=True)
            blk = self.p["layer1"][f"block{b}"]
            if "downsample" in blk:
                x = self.conv(x, base + ("downsample",), relu=False,
                              quantized=True)
            x = jnp.maximum(y + x, 0)
        return x

    # -- BasicBlock branch chain (stride 1, in==out channels)
    def branch(self, x, mod: str, i: int, n_blocks: int):
        for b in range(n_blocks):
            base = (mod, f"branch{i}", f"block{b}")
            y = self.conv(x, base + ("cb1",), relu=True, quantized=True)
            y = self.conv(y, base + ("cb2",), relu=False, quantized=True)
            x = jnp.maximum(y + x, 0)
        return x

    def hr_module(self, xs: List[jax.Array], mod: str, stage: StageCfg):
        from ..ops.upsample import upsample_nearest

        out_ch = stage.out_channels
        ys = [self.branch(xs[i], mod, i, stage.num_blocks[i])
              for i in range(stage.num_branches)]
        if stage.num_branches == 1:
            return ys
        fused = []
        for i in range(stage.num_branches):
            acc = None
            for j in range(stage.num_branches):
                if j == i:
                    contrib = ys[j]
                elif j > i:
                    contrib = self.conv(ys[j], (mod, f"fuse{i}_{j}"),
                                        relu=False)
                    contrib = upsample_nearest(contrib, 2 ** (j - i))
                else:
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        contrib = self.conv(
                            contrib, (mod, f"fuse{i}_{j}_{k}"),
                            stride=2, relu=not last)
                acc = contrib if acc is None else acc + contrib
            fused.append(jnp.maximum(acc, 0))
        return fused

    def transition(self, xs, pre_ch, stage: StageCfg, name: str):
        outs = []
        out_ch = stage.out_channels
        for i in range(stage.num_branches):
            if i < len(pre_ch):
                if out_ch[i] != pre_ch[i]:
                    outs.append(self.conv(xs[i], (f"{name}_{i}",), relu=True))
                else:
                    outs.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - len(pre_ch)):
                    y = self.conv(y, (f"{name}_{i}_{j}",), stride=2, relu=True)
                outs.append(y)
        return outs

    def stages(self, x, cfgs: Tuple[StageCfg, StageCfg, StageCfg]):
        s2, s3, s4 = cfgs
        xs = self.transition([x], (256,), s2, "transition1")
        for m in range(s2.num_modules):
            xs = self.hr_module(xs, f"stage2_m{m}", s2)
        xs = self.transition(xs, s2.out_channels, s3, "transition2")
        for m in range(s3.num_modules):
            xs = self.hr_module(xs, f"stage3_m{m}", s3)
        xs = self.transition(xs, s3.out_channels, s4, "transition3")
        for m in range(s4.num_modules):
            xs = self.hr_module(xs, f"stage4_m{m}", s4)
        return xs


def quant_sites(cfg, scope: str = "branch", stem2: bool = False) -> List[str]:
    """Sites to quantize.

    scope 'branch'   — stage2-4 BasicBlock branch convs (the conservative
    subset: ~80% of stage FLOPs, exchange topology untouched);
    scope 'exchange' — additionally the transition convs and the
    exchange-fusion convs (everything except stem, layer1 and head —
    layer1 is served by the W8A8 Pallas chain, so this is exactly the
    superset compatible with the shipped configuration);
    scope 'wide'     — 'exchange' plus the layer1 bottlenecks for the
    XLA-walk layer1 path (``apply_trunk(include_layer1=True)``);
    ``stem2``        — additionally the second stem conv (64->64 3x3/s2;
    its input is the post-ReLU stem1 output, calibrated like every other
    site).
    """
    sites = ["stem2"] if stem2 else []
    cfgs = stage_cfgs(cfg)
    for sname, stage in zip(("stage2", "stage3", "stage4"), cfgs):
        for m in range(stage.num_modules):
            for i in range(stage.num_branches):
                for b in range(stage.num_blocks[i]):
                    for cb in ("cb1", "cb2"):
                        sites.append(f"{sname}_m{m}/branch{i}/block{b}/{cb}")
    if scope == "wide":
        for b in range(4):
            for cb in ("cb1", "cb2", "cb3"):
                sites.append(f"layer1/block{b}/{cb}")
            if b == 0:
                sites.append("layer1/block0/downsample")
    if scope in ("wide", "exchange"):
        s2, s3, s4 = cfgs
        pre = [(256,), s2.out_channels, s3.out_channels]
        for t, (name, stage) in enumerate(
                zip(("transition1", "transition2", "transition3"),
                    (s2, s3, s4))):
            pre_ch = pre[t]
            for i in range(stage.num_branches):
                if i < len(pre_ch):
                    if stage.out_channels[i] != pre_ch[i]:
                        sites.append(f"{name}_{i}")
                else:
                    for j in range(i + 1 - len(pre_ch)):
                        sites.append(f"{name}_{i}_{j}")
        for sname, stage in zip(("stage2", "stage3", "stage4"), cfgs):
            if stage.num_branches == 1:
                continue
            for m in range(stage.num_modules):
                for i in range(stage.num_branches):
                    for j in range(stage.num_branches):
                        if j > i:
                            sites.append(f"{sname}_m{m}/fuse{i}_{j}")
                        elif j < i:
                            for k in range(i - j):
                                sites.append(f"{sname}_m{m}/fuse{i}_{j}_{k}")
    return sites


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def _stem(variables, images, dtype=jnp.bfloat16, qparams=None):
    """The two stride-2 stem convs.  stem1 stays bf16 (C_in=3 — no MXU win
    and the raw-image range is data-dependent); stem2 (64->64 3x3/s2 at
    128x128, ~1.3 ms of the serving step) runs W8A8 when ``qparams`` holds a
    prepared 'stem2' entry (its input is post-ReLU and calibrated)."""
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]
    x = images.astype(dtype)
    k, b = _fold(p["stem1"], s["stem1"])
    x = _conv_bf16(x, k, b, stride=2, relu=True, dtype=dtype)
    if qparams and "stem2" in qparams:
        return _conv_int8(x, qparams["stem2"], stride=2, relu=True)
    k, b = _fold(p["stem2"], s["stem2"])
    return _conv_bf16(x, k, b, stride=2, relu=True, dtype=dtype)


def _stem_layer1(variables, images, pallas: bool = True,
                 dtype=jnp.bfloat16, qparams=None):
    """Stem + layer1, identical to the shipped fast path (Pallas layer1 on
    TPU; ``pallas=False`` runs the folded bottleneck chain in XLA for CPU
    tests and interpret-mode parity).  ``qparams`` routes stem2 through
    W8A8 when it holds a prepared 'stem2' entry (see ``_stem``)."""
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]
    x = _stem(variables, images, dtype=dtype, qparams=qparams)
    if pallas:
        from ..models.hrnet import _pallas_layer1_apply

        return _pallas_layer1_apply({"params": p, "batch_stats": s}, x)
    # folded 4-bottleneck chain (reference pose_hrnet.py:292 layer1)
    for bidx in range(4):
        blk_p, blk_s = p["layer1"][f"block{bidx}"], s["layer1"][f"block{bidx}"]
        y = _conv_bf16(x, *_fold(blk_p["cb1"], blk_s["cb1"]), relu=True,
                       dtype=dtype)
        y = _conv_bf16(y, *_fold(blk_p["cb2"], blk_s["cb2"]), relu=True,
                       dtype=dtype)
        y = _conv_bf16(y, *_fold(blk_p["cb3"], blk_s["cb3"]), relu=False,
                       dtype=dtype)
        if "downsample" in blk_p:
            x = _conv_bf16(x, *_fold(blk_p["downsample"], blk_s["downsample"]),
                           relu=False, dtype=dtype)
        x = jnp.maximum(y + x, 0)
    return x


def apply_stages(cfg, variables, x, mode: str = "f32",
                 qparams: Params | None = None, dtype=jnp.bfloat16):
    """Run stages 2-4 functionally; returns (xs, amax_dict)."""
    return apply_trunk(cfg, variables, x, mode=mode, qparams=qparams,
                       dtype=dtype, include_layer1=False)


def apply_trunk(cfg, variables, x, mode: str = "f32",
                qparams: Params | None = None, dtype=jnp.bfloat16,
                include_layer1: bool = False):
    """Functional trunk walk: (optionally layer1 +) stages 2-4.

    ``include_layer1`` expects ``x`` to be the stem output (pre-layer1);
    otherwise ``x`` is the layer1 output.  Returns (xs, amax_dict).
    """
    walk = _Walk(variables["params"]["backbone"],
                 variables["batch_stats"]["backbone"], mode, qparams,
                 dtype=dtype)
    if include_layer1:
        x = walk.layer1(x)
    xs = walk.stages(x, stage_cfgs(cfg))
    return xs, walk.amax


def calibrate(cfg, variables, batches: Sequence[jax.Array]
              ) -> Dict[str, float]:
    """Per-site input-activation maxima over calibration batches.

    ``batches``: normalized image arrays (B, H, W, 3).  Returns
    {site: amax} for every conv input in stages 2-4, stem2, and the four
    head inputs (host floats).  Runs the folded XLA walk — site
    activations match the Pallas serving paths within bf16 noise.
    """
    @jax.jit
    def one_batch(variables, images):
        # calibrate through the folded layer1 walk so layer1/transition/
        # fusion sites get amax records too (the 'wide' scope needs them;
        # activations match the pallas path within bf16 noise)
        p = variables["params"]["backbone"]
        s = variables["batch_stats"]["backbone"]
        x = images.astype(jnp.bfloat16)
        k, b = _fold(p["stem1"], s["stem1"])
        x = _conv_bf16(x, k, b, stride=2, relu=True)
        stem2_amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
        k, b = _fold(p["stem2"], s["stem2"])
        x = _conv_bf16(x, k, b, stride=2, relu=True)
        xs, batch_amax = apply_trunk(cfg, variables, x, mode="calibrate",
                                     include_layer1=True)
        batch_amax["stem2"] = stem2_amax
        # the four stage-4 outputs feed the head: record their ranges so
        # the head can take int8 inputs (post-ReLU, like every other site)
        for i, xi in enumerate(xs):
            batch_amax[f"head_in{i}"] = jnp.max(jnp.abs(xi)).astype(
                jnp.float32)
        return batch_amax

    amax: Dict[str, float] = {}
    for images in batches:
        batch_amax = jax.device_get(one_batch(variables, jnp.asarray(images)))
        for site, m in batch_amax.items():
            amax[site] = max(amax.get(site, 0.0), float(m))
    return amax


CALIBRATION_VERSION = 1


def save_calibration(path: str, amax: Dict[str, float], cfg=None) -> None:
    """Persist a calibration record ({site: amax}) as JSON.

    The production serving flow calibrates ONCE offline (tools/calibrate.py)
    and ships the record next to the checkpoint; serving entries
    (tools/inference.py --calib, Evaluator2D(calib_path=...)) then build
    qparams without touching calibration data.  ``cfg`` stamps the model
    name / image size so a record cannot silently be applied to a different
    architecture.
    """
    import json

    rec = {
        "version": CALIBRATION_VERSION,
        "model": str(cfg.MODEL.NAME) if cfg is not None else "",
        "image_size": ([int(v) for v in cfg.MODEL.IMAGE_SIZE]
                       if cfg is not None else None),
        "amax": {k: float(v) for k, v in sorted(amax.items())},
    }
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)


def load_calibration(path: str, cfg=None) -> Dict[str, float]:
    """Load a calibration record written by ``save_calibration``; verifies
    the version and (when ``cfg`` is given) the model / image-size stamps."""
    import json

    with open(path) as f:
        rec = json.load(f)
    if rec.get("version") != CALIBRATION_VERSION:
        raise ValueError(
            f"calibration record {path}: version {rec.get('version')!r}, "
            f"expected {CALIBRATION_VERSION}")
    if cfg is not None and rec.get("model"):
        if rec["model"] != str(cfg.MODEL.NAME):
            raise ValueError(
                f"calibration record {path} was made for model "
                f"{rec['model']!r}, config builds {str(cfg.MODEL.NAME)!r}")
    if cfg is not None and rec.get("image_size"):
        want = [int(v) for v in cfg.MODEL.IMAGE_SIZE]
        if [int(v) for v in rec["image_size"]] != want:
            raise ValueError(
                f"calibration record {path} was made at image size "
                f"{rec['image_size']}, config uses {want} (activation "
                f"maxima are resolution-dependent; recalibrate)")
    return {k: float(v) for k, v in rec["amax"].items()}


def quantize_weight(kernel) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 weights; returns (kq, wscale).
    THE quantization scheme — the Pallas chains (ops/pallas/int8_chain.py)
    import it so the '<0.1 px, same scheme' contract cannot drift."""
    kernel = np.asarray(kernel, np.float32)
    wmax = np.abs(kernel).reshape(-1, kernel.shape[-1]).max(axis=0)
    wscale = np.maximum(wmax, 1e-12) / 127.0
    kq = np.clip(np.round(kernel / wscale), -127, 127).astype(np.int8)
    return kq, wscale


def site_scale(amax: Dict[str, float], site: str) -> float:
    """Symmetric per-tensor activation scale from a calibration record."""
    if site not in amax:
        raise KeyError(f"no calibration record for {site}")
    return max(float(amax[site]), 1e-12) / 127.0


def prepare_quant_params(cfg, variables, amax: Dict[str, float],
                         scope: str = "branch",
                         stem2: bool = False) -> Params:
    """Offline weight quantization: {site: {kq, wscale, sa, bias}}.

    ``scope``/``stem2`` pick the quantized site set (see ``quant_sites``);
    per-output-channel weight scales, per-tensor activation scale from
    calibration.
    """
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]
    out: Params = {}
    for site in quant_sites(cfg, scope, stem2=stem2):
        node_p, node_s = p, s
        for k in site.split("/"):
            node_p, node_s = node_p[k], node_s[k]
        kernel, bias = _fold(node_p, node_s)
        kq, wscale = quantize_weight(kernel)
        out[site] = {
            "kq": jnp.asarray(kq),
            "wscale": jnp.asarray(wscale, jnp.float32),
            "sa": jnp.float32(site_scale(amax, site)),
            "bias": jnp.asarray(np.asarray(bias, np.float32)),
        }
    return out


def prepare_serving_qparams(cfg, variables, amax: Dict[str, float],
                            scope: str = "exchange", stem2: bool = True,
                            layer1_chain: bool = True,
                            int8_head: bool = False) -> Params:
    """THE shipped serving configuration, in one place: exchange-scope int8
    trunk (stage2-4 branch + transition + exchange-fusion convs) + W8A8
    stem2 + the W8A8 Pallas layer1 chain (+ optionally int8 head inputs).
    bench.py, Evaluator2D(serving='int8') and tools/inference.py
    --serving int8 all build their qparams here.  scope='branch' reverts
    to the round-3 conservative subset (measured ~3% slower, PERF.md
    round-4 exchange section); accuracy for BOTH scopes is decode-gated
    at full size on trained weights (tools/accuracy_gate_full.py: max
    shift 0.033 px on either, 3x under the 0.1 px gate)."""
    qparams = dict(prepare_quant_params(cfg, variables, amax, scope=scope,
                                        stem2=stem2))
    if layer1_chain:
        from ..ops.pallas.int8_chain import prepare_layer1_int8

        # flat params only: the block topology (shortcut flags, widths) is
        # re-derived from the variables STRUCTURE at trace time, which is
        # static under jit — flags stored as pytree leaves would trace
        qparams[LAYER1_CHAIN_KEY] = prepare_layer1_int8(variables, amax)[0]
    if int8_head:
        qparams[HEAD_SCALES_KEY] = prepare_head_input_scales(amax)
    return qparams


def layer1_topology(variables) -> Tuple[bool, ...]:
    """Per-block projection-shortcut flags from the params structure."""
    l1 = variables["params"]["backbone"]["layer1"]
    return tuple("downsample" in l1[f"block{b}"] for b in range(len(l1)))


LAYER1_CHAIN_KEY = "_layer1_chain"
HEAD_SCALES_KEY = "_head_scales"

# ImageNet normalization (reference lib/dataset/*: transforms.Normalize)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def prepare_head_input_scales(amax: Dict[str, float]) -> Tuple[jax.Array, ...]:
    """Per-branch symmetric int8 scales for the head's four stage-4 inputs
    (calibration records ``head_in{i}``).  Store under
    ``qparams[HEAD_SCALES_KEY]`` to serve the head from int8 stage outputs
    (halved head input reads; the head is input-read-bound, PERF.md)."""
    return tuple(
        jnp.float32(max(float(amax[f"head_in{i}"]), 1e-12) / 127.0)
        for i in range(4))


def make_quant_infer(cfg, interpret: bool = False, pallas_layer1: bool = True,
                     trunk: str = "quant", input_norm=None, mesh=None):
    """Jitted int8-trunk serving forward: (variables, qparams, images) ->
    (B, K, 2) decoded heatmap coords.  Head runs the shipped Pallas
    fused-head-decode v2; stem/layer1 the shipped bf16/Pallas path.
    ``trunk='f32'`` runs the same functional walk unquantized (the parity
    reference for the <0.1 px gate).

    If ``qparams[LAYER1_CHAIN_KEY]`` is present (the flat tuple from
    ``ops.pallas.int8_chain.prepare_layer1_int8``), layer1 runs as ONE
    VMEM-resident W8A8 Pallas kernel (int8 MXU rate + fused-chain HBM
    traffic; the bf16 Pallas chain or the per-site int8 walk are the
    fallbacks).

    ``input_norm=(mean, std)`` makes the serving entry take RAW uint8
    images (B, H, W, 3) and normalize on device — a 4x cut of the
    host->device/input-HBM traffic vs pre-normalized f32 (the cast+affine
    fuses into the stem conv's input pipeline).  Pass
    (IMAGENET_MEAN, IMAGENET_STD) for the reference datasets' transform.

    ``mesh`` scales serving across chips: the whole forward (Pallas
    kernels included) runs per-shard under ``shard_map`` with the batch
    sharded on the mesh's 'data' axis and params/qparams replicated — the
    multi-chip equivalent of the reference's DataParallel eval
    (reference tools/evaluate_2D.py:176)."""
    from ..ops.pallas.fused_head_decode import (fused_head_decode_v2,
                                                prepare_head_params)
    from ..ops.pallas.int8_chain import fused_bottleneck_chain_int8

    if input_norm is not None:
        _mean = jnp.asarray(input_norm[0], jnp.float32) * 255.0
        _inv_std = 1.0 / (jnp.asarray(input_norm[1], jnp.float32) * 255.0)

    def infer(variables, qparams, images):
        if input_norm is not None:
            images = ((images.astype(jnp.float32) - _mean)
                      * _inv_std).astype(jnp.bfloat16)
        head_scales = qparams.get(HEAD_SCALES_KEY)
        # qparams' KEY SET is static under jit: it routes layer1 to the
        # int8 Pallas chain / the quantized walk ('wide' scope) / bf16
        qparams = {k: v for k, v in qparams.items()
                   if k != HEAD_SCALES_KEY}
        if LAYER1_CHAIN_KEY in qparams:
            chain_flat = qparams[LAYER1_CHAIN_KEY]
            rest = {k: v for k, v in qparams.items()
                    if k != LAYER1_CHAIN_KEY}
            x = _stem(variables, images, qparams=rest)
            # topology from the params STRUCTURE (static under jit); the
            # chain's output width is the trailing bias vector's length
            x = fused_bottleneck_chain_int8(
                x, tuple(chain_flat),
                shortcut_flags=layer1_topology(variables),
                out_channels=chain_flat[-1].shape[0], interpret=interpret)
            xs, _ = apply_stages(cfg, variables, x, mode=trunk,
                                 qparams=rest)
        elif any(s.startswith("layer1/") for s in qparams):
            x = _stem(variables, images, qparams=qparams)
            xs, _ = apply_trunk(cfg, variables, x, mode=trunk,
                                qparams=qparams, include_layer1=True)
        else:
            x = _stem_layer1(variables, images, pallas=pallas_layer1,
                             qparams=qparams)
            xs, _ = apply_stages(cfg, variables, x, mode=trunk,
                                 qparams=qparams)
        head = prepare_head_params(variables)
        if head_scales is not None:
            # int8 stage outputs: the quantize fuses into the producers'
            # epilogues, the head reads half the bytes (dequant is folded
            # into the head kernel slices inside fused_head_decode_v2)
            xs = [jnp.clip(jnp.round(x.astype(jnp.float32) / sa),
                           -127, 127).astype(jnp.int8)
                  for x, sa in zip(xs, head_scales)]
            return fused_head_decode_v2(xs, head, interpret=interpret,
                                        input_scales=head_scales)
        return fused_head_decode_v2(xs, head, interpret=interpret)

    if mesh is None:
        return jax.jit(infer)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded = shard_map(infer, mesh=mesh,
                        in_specs=(P(), P(), P("data")),
                        out_specs=P("data"), check_vma=False)
    return jax.jit(sharded)
