"""Pallas TPU kernel: fused bottleneck-block chain (HRNet layer1).

PERF.md's stage ablation shows layer1 (4 bottleneck blocks at 64x64x256,
reference pose_hrnet.py:292) is HBM-bound: ~2.8 GB of activation traffic
per 128-batch step through XLA's per-conv schedule.  This kernel runs the
whole 4-block chain per sample with every intermediate VMEM-resident —
HBM sees one (64,64,64) read and one (64,64,256) write per sample, a ~5x
traffic cut for the layer.

Assumes BatchNorm has been folded (utils/fold_bn.py), so each conv is
kernel + per-channel bias and blocks reduce to:

    y = relu(conv1x1_3(relu(conv3x3_2(relu(conv1x1_1(x))))) + shortcut(x))

Convs are expressed as MXU matmuls: 1x1 directly on the (HW, C) flattening,
3x3 as 9 shifted matmuls over a zero-padded VMEM copy.  All accumulation in
f32, activations bf16.

Weight layout per block (see ``extract_layer1_params``):
    w1 (Cin, Cm), b1 (Cm); w2 (3, 3, Cm, Cm), b2 (Cm); w3 (Cm, Cout),
    b3 (Cout); optional ws (Cin, Cout), bs (Cout) for the projection
    shortcut (block 0 only in layer1).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_body(x_hw_c, params, has_shortcut, im2col_mode="full"):
    """One folded bottleneck on a (H, W, Cin) or (TB, H, W, Cin) VMEM value."""
    if x_hw_c.ndim == 3:
        x_hw_c = x_hw_c[None]
    tb, h, w, cin = x_hw_c.shape
    flat = x_hw_c.reshape(tb * h * w, cin)

    y = jnp.dot(flat, params["w1"], preferred_element_type=jnp.float32)
    y = jnp.maximum(y + params["b1"], 0.0).astype(jnp.bfloat16)     # (N, Cm)
    cm = y.shape[-1]

    ypad = jnp.pad(y.reshape(tb, h, w, cm),
                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = params["w2"].reshape(9 * cm, cm)
    if im2col_mode == "full":
        # 3x3 conv as ONE im2col matmul: (N, 9*Cm) @ (9*Cm, Cm).  The taller
        # contracting dim keeps the MXU busy (9 separate (.., Cm) matmuls
        # leave most of the systolic array idle for Cm=64).
        cols = jnp.concatenate(
            [ypad[:, di:di + h, dj:dj + w, :].reshape(tb * h * w, cm)
             for di in range(3) for dj in range(3)], axis=1)        # (N, 9Cm)
        acc = jnp.dot(cols, w2, preferred_element_type=jnp.float32)
    else:
        # "rows": one 3-tap im2col + matmul per kernel row (K=3*Cm), f32
        # accumulated — third the VMEM-copy volume per concat at still-decent
        # contraction depth.
        acc = None
        for di in range(3):
            cols = jnp.concatenate(
                [ypad[:, di:di + h, dj:dj + w, :].reshape(tb * h * w, cm)
                 for dj in range(3)], axis=1)                       # (N, 3Cm)
            part = jnp.dot(cols, w2[3 * cm * di:3 * cm * (di + 1)],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = jnp.maximum(acc + params["b2"], 0.0).astype(jnp.bfloat16)

    out = jnp.dot(y, params["w3"], preferred_element_type=jnp.float32)
    out = out + params["b3"]

    if has_shortcut:
        sc = jnp.dot(flat, params["ws"], preferred_element_type=jnp.float32)
        sc = sc + params["bs"]
    else:
        sc = flat.astype(jnp.float32)
    return jnp.maximum(out + sc, 0.0).astype(jnp.bfloat16).reshape(tb, h, w, -1)


def _make_kernel(n_blocks: int, shortcut_flags: Tuple[bool, ...],
                 im2col_mode: str = "full"):
    def kernel(x_ref, *refs):
        # refs: per-block param refs (flattened), then out_ref last
        out_ref = refs[-1]
        param_refs = refs[:-1]
        x = x_ref[...]
        idx = 0
        for b in range(n_blocks):
            names = ["w1", "b1", "w2", "b2", "w3", "b3"]
            if shortcut_flags[b]:
                names += ["ws", "bs"]
            params = {}
            for name in names:
                params[name] = param_refs[idx][...]
                idx += 1
            x = _block_body(x, params, shortcut_flags[b], im2col_mode)
        out_ref[...] = x

    return kernel


@partial(jax.jit, static_argnames=("shortcut_flags", "out_channels",
                                   "interpret", "samples_per_program",
                                   "im2col_mode"))
def fused_bottleneck_chain(x: jax.Array, params_flat: Tuple[jax.Array, ...],
                           shortcut_flags: Tuple[bool, ...] = (True, False, False, False),
                           out_channels: int = 256,
                           interpret: bool = False,
                           samples_per_program: int = 1,
                           im2col_mode: str = "full") -> jax.Array:
    """x: (B, H, W, Cin) bf16 -> (B, H, W, out_channels) bf16.

    ``params_flat``: per-block params in order (w1,b1,w2,b2,w3,b3[,ws,bs]).
    """
    b, h, w, cin = x.shape
    tb = samples_per_program if b % samples_per_program == 0 else 1
    n_blocks = len(shortcut_flags)
    kernel = _make_kernel(n_blocks, tuple(shortcut_flags), im2col_mode)
    in_specs = [pl.BlockSpec((tb, h, w, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for p in params_flat:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, h, w, out_channels), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, out_channels), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, *params_flat)


def _stem_layer1_kernel(x_ref, ws1_ref, bs1_ref, ws2_ref, bs2_ref, *refs,
                        n_blocks, shortcut_flags):
    """Whole stem + layer1 per image, VMEM-resident.

    x_ref: (1, 128, 128, 12) space-to-depth input (2x2 blocks of the 256x256
    RGB image; see core/fast_infer._space_to_depth).  The 3x3/s2 stem convs
    are exact space-to-depth rewrites (fast_infer._s2d_kernel algebra):
    stem1 becomes a 2x2/s1 conv on the s2d input; stem2's stride-2 taps are
    assembled from the four parity planes of the stem1 output (Mosaic has no
    strided sublane loads, so parity planes come from sublane-only reshapes
    + static middle-dim slices).  Then the 4 bottleneck blocks run as in
    ``fused_bottleneck_chain``.  HBM sees one 384KB read and one 2MB write
    per image instead of the ~5MB of intermediate traffic XLA's per-conv
    schedule needs (PERF.md round 2).
    """
    out_ref = refs[-2]
    taps_ref = refs[-1]   # scratch (9, 4096, 64) bf16
    param_refs = refs[:-2]

    x = x_ref[0]                                      # (HS, WS, 12) bf16
    hs, ws = x.shape[0], x.shape[1]                   # H/2, W/2 (s2d blocks)
    ho, wo = hs // 2, ws // 2                         # layer1 resolution
    # stem1: 2x2/s1 conv, pad ((1,0),(1,0)) on the s2d tensor.  Accumulated
    # as 4 small matmuls (a lane concat of the shifted slices trips Mosaic's
    # offset-mismatch check; at K=12 the concat isn't worth fighting for).
    xp = jnp.pad(x, ((1, 0), (1, 0), (0, 0)))
    y1 = None
    for i, (di, dj) in enumerate((a, b) for a in range(2) for b in range(2)):
        piece = xp[di:di + hs, dj:dj + ws, :].reshape(hs * ws, 12)
        part = jnp.dot(piece, ws1_ref[i], preferred_element_type=jnp.float32)
        y1 = part if y1 is None else y1 + part
    y1 = jnp.maximum(y1 + bs1_ref[...], 0.0).astype(jnp.bfloat16)
    y1 = y1.reshape(hs, ws, 64)

    # stem2: 3x3/s2 conv via parity planes.  out(i,j) tap (kh,kw) reads
    # y1[2i-1+kh, 2j-1+kw]: row parity p=(kh+1)%2, block shift -1 iff kh==0.
    # Taps are staged through a VMEM scratch ref: the plane slices carry
    # mismatched vector-padding offsets that Mosaic cannot concat directly;
    # a store+load round-trip through the scratch canonicalises the layout.
    planes = {}
    rowview = y1.reshape(ho, 2, ws, 64)
    for r in range(2):
        rp = rowview[:, r].reshape(ho, wo, 2, 64)
        for c in range(2):
            planes[(r, c)] = rp[:, :, c]              # (ho, wo, 64)

    for i, (kh, kw) in enumerate((a, b) for a in range(3) for b in range(3)):
        p = planes[((kh + 1) % 2, (kw + 1) % 2)]
        if kh == 0:   # rows i-1: prepend zero row-block, drop last
            p = jnp.pad(p[:-1], ((1, 0), (0, 0), (0, 0)))
        if kw == 0:
            p = jnp.pad(p[:, :-1], ((0, 0), (1, 0), (0, 0)))
        taps_ref[i] = p.reshape(ho * wo, 64)

    cols2 = jnp.concatenate([taps_ref[i] for i in range(9)], axis=1)
    y2 = jnp.dot(cols2, ws2_ref[...], preferred_element_type=jnp.float32)
    y2 = jnp.maximum(y2 + bs2_ref[...], 0.0).astype(jnp.bfloat16)
    y2 = y2.reshape(ho, wo, 64)

    idx = 0
    for b in range(n_blocks):
        names = ["w1", "b1", "w2", "b2", "w3", "b3"]
        if shortcut_flags[b]:
            names += ["ws", "bs"]
        params = {}
        for name in names:
            params[name] = param_refs[idx][...]
            idx += 1
        y2 = _block_body(y2, params, shortcut_flags[b])
    out_ref[...] = y2


@partial(jax.jit, static_argnames=("shortcut_flags", "out_channels", "interpret"))
def fused_stem_layer1(x_s2d: jax.Array, stem_flat: Tuple[jax.Array, ...],
                      params_flat: Tuple[jax.Array, ...],
                      shortcut_flags: Tuple[bool, ...] = (True, False, False, False),
                      out_channels: int = 256,
                      interpret: bool = False) -> jax.Array:
    """x_s2d: (B, 128, 128, 12) bf16 s2d input -> (B, 64, 64, 256) bf16.

    ``stem_flat``: (ws1 (4, 12, 64), bs1 (64,), ws2 (576, 64), bs2 (64,)) with
    ws1 the s2d-rewritten stem1 kernel (fast_infer._s2d_kernel reshaped to one
    (12, 64) slab per 2x2 tap) and ws2 the folded stem2 kernel reshaped
    (3,3,64,64)->(576,64).
    ``params_flat``: layer1 blocks as in ``fused_bottleneck_chain``.
    """
    b, hs, ws = x_s2d.shape[0], x_s2d.shape[1], x_s2d.shape[2]
    ho, wo = hs // 2, ws // 2
    kernel = partial(_stem_layer1_kernel, n_blocks=len(shortcut_flags),
                     shortcut_flags=tuple(shortcut_flags))
    in_specs = [pl.BlockSpec((1, hs, ws, 12), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                 for _ in range(4 + len(params_flat))]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ho, wo, out_channels), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, out_channels), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((9, ho * wo, 64), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x_s2d, *stem_flat, *params_flat)


def _basic_block_body(x_hw_c, w1, b1, w2, b2):
    """One folded BasicBlock: relu(conv3x3(relu(conv3x3(x))) + x)
    (reference pose_hrnet.py:28-57, stride 1, matching channels)."""
    h, w, c = x_hw_c.shape

    def conv3(y, wk, bias):
        ypad = jnp.pad(y, ((1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [ypad[di:di + h, dj:dj + w, :].reshape(h * w, c)
             for di in range(3) for dj in range(3)], axis=1)
        out = jnp.dot(cols, wk.reshape(9 * c, c),
                      preferred_element_type=jnp.float32)
        return out + bias

    y = jnp.maximum(conv3(x_hw_c, w1, b1), 0.0).astype(jnp.bfloat16).reshape(h, w, c)
    out = conv3(y, w2, b2) + x_hw_c.reshape(h * w, c).astype(jnp.float32)
    return jnp.maximum(out, 0.0).astype(jnp.bfloat16).reshape(h, w, c)


def _basic_block_body_tb(x_tb, w1, b1, w2, b2):
    """BasicBlock on a (TB, H, W, C) tile: batch folds into the im2col rows
    so the matmuls see TB*H*W rows (amortises tiny-spatial branches)."""
    tb, h, w, c = x_tb.shape

    def conv3(y, wk, bias):
        ypad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [ypad[:, di:di + h, dj:dj + w, :].reshape(tb * h * w, c)
             for di in range(3) for dj in range(3)], axis=1)
        out = jnp.dot(cols, wk.reshape(9 * c, c),
                      preferred_element_type=jnp.float32)
        return out + bias

    y = jnp.maximum(conv3(x_tb, w1, b1), 0.0).astype(jnp.bfloat16)
    y = y.reshape(tb, h, w, c)
    out = conv3(y, w2, b2) + x_tb.reshape(tb * h * w, c).astype(jnp.float32)
    return jnp.maximum(out, 0.0).astype(jnp.bfloat16).reshape(tb, h, w, c)


def _make_basic_kernel(n_blocks: int):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        param_refs = refs[:-1]
        x = x_ref[...]
        for b in range(n_blocks):
            w1, b1, w2, b2 = (param_refs[4 * b + i][...] for i in range(4))
            x = _basic_block_body_tb(x, w1, b1, w2, b2)
        out_ref[...] = x

    return kernel


@partial(jax.jit, static_argnames=("n_blocks", "samples_per_block", "interpret"))
def fused_basic_chain(x: jax.Array, params_flat: Tuple[jax.Array, ...],
                      n_blocks: int, samples_per_block: int = 1,
                      interpret: bool = False) -> jax.Array:
    """Chain of BasicBlocks (HRNet branch bodies) in one VMEM pass.

    x: (B, H, W, C) bf16; params_flat: per-block (w1 (3,3,C,C), b1, w2, b2).
    ``samples_per_block`` folds several samples into one grid program —
    essential for the small-spatial branches where per-sample programs
    leave the MXU idle.
    """
    b, h, w, c = x.shape
    tb = samples_per_block if b % samples_per_block == 0 else 1
    kernel = _make_basic_kernel(n_blocks)
    in_specs = [pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params_flat]
    return pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, *params_flat)


def basic_chain_reference(x: jax.Array, params_flat, n_blocks: int) -> jax.Array:
    """XLA reference of the folded BasicBlock chain."""
    y = x
    for b in range(n_blocks):
        w1, b1, w2, b2 = params_flat[4 * b: 4 * b + 4]
        dn = jax.lax.conv_dimension_numbers(y.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
        h1 = jax.lax.conv_general_dilated(y, w1, (1, 1), [(1, 1), (1, 1)],
                                          dimension_numbers=dn,
                                          preferred_element_type=jnp.float32)
        h1 = jax.nn.relu(h1 + b1).astype(jnp.bfloat16)
        h2 = jax.lax.conv_general_dilated(h1, w2, (1, 1), [(1, 1), (1, 1)],
                                          dimension_numbers=dn,
                                          preferred_element_type=jnp.float32)
        y = jax.nn.relu(h2 + b2 + y.astype(jnp.float32)).astype(jnp.bfloat16)
    return y


def extract_layer1_params(folded_variables: Dict) -> Tuple[Tuple[jax.Array, ...],
                                                           Tuple[bool, ...]]:
    """Pull the folded layer1 weights out of a PoseHRNet variables tree
    (after utils/fold_bn.fold_batchnorm) into the kernel's flat layout."""
    layer1 = folded_variables["params"]["backbone"]["layer1"]
    flat: List[jax.Array] = []
    flags: List[bool] = []
    for bidx in range(4):
        blk = layer1[f"block{bidx}"]

        def conv_of(cb):
            k = blk[cb]["conv"]["kernel"]
            # folded BN bias lives on the bn node (fold_bn keeps it there)
            bias = blk[cb]["bn"]["bias"]
            return k, bias

        k1, b1 = conv_of("cb1")
        k2, b2 = conv_of("cb2")
        k3, b3 = conv_of("cb3")
        flat += [jnp.asarray(k1)[0, 0].astype(jnp.bfloat16), jnp.asarray(b1, jnp.float32),
                 jnp.asarray(k2).astype(jnp.bfloat16), jnp.asarray(b2, jnp.float32),
                 jnp.asarray(k3)[0, 0].astype(jnp.bfloat16), jnp.asarray(b3, jnp.float32)]
        if "downsample" in blk:
            ks, bs = conv_of("downsample")
            flat += [jnp.asarray(ks)[0, 0].astype(jnp.bfloat16),
                     jnp.asarray(bs, jnp.float32)]
            flags.append(True)
        else:
            flags.append(False)
    return tuple(flat), tuple(flags)


def layer1_reference(x: jax.Array, params_flat, shortcut_flags) -> jax.Array:
    """XLA reference of the same folded chain (for parity tests/benchmarks)."""
    idx = 0
    y = x
    for has_sc in shortcut_flags:
        names = ["w1", "b1", "w2", "b2", "w3", "b3"] + (["ws", "bs"] if has_sc else [])
        p = {}
        for n in names:
            p[n] = params_flat[idx]
            idx += 1
        flat_in = y.astype(jnp.float32)
        h1 = jax.nn.relu(jnp.einsum("bhwc,cm->bhwm", flat_in, p["w1"].astype(jnp.float32)) + p["b1"])
        dn = jax.lax.conv_dimension_numbers(h1.shape, p["w2"].shape, ("NHWC", "HWIO", "NHWC"))
        h2 = jax.lax.conv_general_dilated(h1, p["w2"].astype(jnp.float32), (1, 1),
                                          [(1, 1), (1, 1)], dimension_numbers=dn)
        h2 = jax.nn.relu(h2 + p["b2"])
        h3 = jnp.einsum("bhwc,cm->bhwm", h2, p["w3"].astype(jnp.float32)) + p["b3"]
        if has_sc:
            sc = jnp.einsum("bhwc,cm->bhwm", flat_in, p["ws"].astype(jnp.float32)) + p["bs"]
        else:
            sc = flat_in
        y = jax.nn.relu(h3 + sc).astype(jnp.bfloat16)
    return y
