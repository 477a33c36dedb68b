"""Production inference fast path: Pallas-fused layer1 + head + decode.

Composes the HRNet backbone (with the fused layer1 kernel) applied directly
on the ``backbone`` variables subtree with the fused head+decode kernel —
the highest-throughput single-chip serving configuration (see PERF.md).
Numerics are eval-exact up to bf16 rounding (BN folded analytically).

    fn = make_fast_infer(cfg)
    coords = fn(variables, images)   # (B, K, 2) heatmap-pixel coords
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.hrnet import HRNetBackbone, StageCfg
from ..models.layers import BN_EPS
from ..ops.pallas.fused_head_decode import (fused_head_decode,
                                            fused_head_decode_v2,
                                            prepare_head_params)


def _fold_cb(cb_params, cb_stats):
    """Fold eval-mode BN into the conv: returns (kernel', bias')."""
    inv = cb_params["bn"]["scale"] / jnp.sqrt(cb_stats["bn"]["var"] + BN_EPS)
    return (cb_params["conv"]["kernel"] * inv,
            cb_params["bn"]["bias"] - cb_stats["bn"]["mean"] * inv)


def _space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (pr*2+pc)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel(k):
    """Rewrite a 3x3/stride-2/pad-1 conv kernel for the space-to-depth input.

    A stride-2 3x3 conv output at (i, j) reads input rows 2i-1..2i+1: in
    2x2-block coordinates that is blocks i-1..i with pixel parities
    (kh=0 -> block i-1 parity 1; kh=1,2 -> block i parity kh-1).  So the op
    is EXACTLY a 2x2 stride-1 conv over the (H/2, W/2, 4C) tensor with pad
    ((1,0),(1,0)) — the same sums up to float summation order (the reordered
    accumulation rounds bf16 ~1 ulp differently), with 4x the input channels
    and no stride, which tiles far better onto the MXU when C_in is tiny
    (the RGB stem's C_in=3 wastes 125/128 MXU lanes).
    """
    cin, cout = k.shape[2], k.shape[3]
    k2 = jnp.zeros((2, 2, 4 * cin, cout), k.dtype)
    for kh in range(3):
        bi, pr = (0, 1) if kh == 0 else (1, kh - 1)
        for kw in range(3):
            bj, pc = (0, 1) if kw == 0 else (1, kw - 1)
            off = (pr * 2 + pc) * cin
            k2 = k2.at[bi, bj, off:off + cin].set(k[kh, kw])
    return k2


def _s2d_stem_apply(variables, images, dtype):
    """Both stem convs as space-to-depth 2x2 dense convs, BN folded."""
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]
    x = _space_to_depth(images.astype(dtype))
    for name in ("stem1", "stem2"):
        k, b = _fold_cb(p[name], s[name])
        x = jax.lax.conv_general_dilated(
            x, _s2d_kernel(k).astype(dtype), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + b.astype(dtype))
        if name == "stem1":
            x = _space_to_depth(x)
    return x


def _fused_stem_layer1_apply(variables, images, interpret=False):
    """Run stem + layer1 as ONE Pallas kernel (ops/pallas/fused_bottleneck.
    fused_stem_layer1): s2d the image in XLA, fold all BNs inline, and feed
    the s2d-rewritten stem kernels + layer1 chain to the kernel."""
    from ..models.layers import BN_EPS
    from ..ops.pallas.fused_bottleneck import fused_stem_layer1

    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]

    k1, b1 = _fold_cb(p["stem1"], s["stem1"])
    k2, b2 = _fold_cb(p["stem2"], s["stem2"])
    stem_flat = (
        _s2d_kernel(k1).reshape(4, 12, 64).astype(jnp.bfloat16),
        b1.astype(jnp.float32),
        k2.reshape(576, 64).astype(jnp.bfloat16),
        b2.astype(jnp.float32),
    )

    flat, flags = [], []
    for bidx in range(4):
        blk_p, blk_s = p["layer1"][f"block{bidx}"], s["layer1"][f"block{bidx}"]
        for cb, squeeze in (("cb1", True), ("cb2", False), ("cb3", True)):
            k, bb = _fold_cb(blk_p[cb], blk_s[cb])
            k = k[0, 0] if squeeze else k
            flat += [k.astype(jnp.bfloat16), bb.astype(jnp.float32)]
        if "downsample" in blk_p:
            ks, bs = _fold_cb(blk_p["downsample"], blk_s["downsample"])
            flat += [ks[0, 0].astype(jnp.bfloat16), bs.astype(jnp.float32)]
            flags.append(True)
        else:
            flags.append(False)

    x = _space_to_depth(images.astype(jnp.bfloat16))
    return fused_stem_layer1(x, stem_flat, tuple(flat), tuple(flags),
                             interpret=interpret)


def precast_variables(variables, dtype=jnp.bfloat16):
    """One-time serving-weights cast: stage/transition/stem conv kernels and
    BN leaves to ``dtype`` so per-step in-graph casts become no-ops (saves
    ~170MB/step of f32 weight reads at w32 scale).  The ``layer1`` subtree
    and the head params stay f32 — the Pallas fast paths fold BN from f32
    there, and changing the fold precision would perturb parity.
    """
    def cast_tree(tree, skip=()):
        out = {}
        for key, leaf in tree.items():
            if key in skip:
                out[key] = leaf
            elif isinstance(leaf, dict):
                out[key] = cast_tree(leaf)
            else:
                out[key] = leaf.astype(dtype) if leaf.dtype == jnp.float32 else leaf
        return out

    result = dict(variables)
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        tree = dict(variables[coll])
        if "backbone" in tree:
            tree["backbone"] = cast_tree(tree["backbone"],
                                         skip=("layer1", "stem1", "stem2"))
        result[coll] = {**variables[coll], **tree}
    return result


def make_fast_infer(cfg, pallas_layer1: bool = True,
                    pallas_branches: bool = False, interpret: bool = False,
                    s2d_stem: bool = False, fuse_stem_layer1: bool = False):
    # fuse_stem_layer1 defaults OFF: the whole stem+layer1 Pallas kernel is
    # parity-exact but measured 53.6 vs 30.1 ms at B=128 — the parity-plane
    # stride-2 taps and scratch staging lower to pathological Mosaic relayout
    # code (PERF.md round 2).  Kept for experimentation.
    # pallas_branches defaults OFF: the per-branch BasicBlock kernels measured
    # 4x slower than XLA on TPU (tiny per-program work serialises branches XLA
    # runs concurrently; PERF.md) — kept for experimentation only.
    extra = cfg.MODEL.EXTRA
    backbone = HRNetBackbone(
        stage2=StageCfg.from_cfg(extra["STAGE2"]),
        stage3=StageCfg.from_cfg(extra["STAGE3"]),
        stage4=StageCfg.from_cfg(extra["STAGE4"]),
        dtype=jnp.bfloat16,
        pallas_layer1=pallas_layer1,
        pallas_branches=pallas_branches,
        skip_stem=s2d_stem,
        skip_layer1=fuse_stem_layer1,
    )

    @jax.jit
    def infer(variables, images):
        bb_vars = {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        }
        if fuse_stem_layer1:
            images = _fused_stem_layer1_apply(variables, images,
                                              interpret=interpret)
        elif s2d_stem:
            images = _s2d_stem_apply(variables, images, jnp.bfloat16)
        xs = backbone.apply(bb_vars, images, False)
        head = prepare_head_params(variables)
        return fused_head_decode_v2(xs, head, interpret=interpret)

    return infer
