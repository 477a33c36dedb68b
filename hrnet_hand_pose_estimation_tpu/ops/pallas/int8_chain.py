"""Pallas TPU kernels: int8 W8A8 fused block chains.

v5e's MXU runs int8 matmuls at 2x the bf16 rate, and the fused chains in
``fused_bottleneck.py`` already cut the HBM traffic of layer1 / the stage
branch chains to one read + one write per tile.  These kernels combine the
two: the whole chain stays VMEM-resident AND every conv matmul runs
int8 x int8 -> int32 on the MXU, using exactly the W8A8 scheme of
``core/quant_infer.py`` (BN-folded symmetric per-output-channel weight
scales, calibrated symmetric per-tensor activation scales; the <0.1 px
decode gate of ``tests/test_quant_infer.py`` applies to the serving path
that uses them).

Scale folding: for chain-internal convs the dequant epilogue and the NEXT
conv's activation quantization are fused into one affine —

    y_int8 = clip(round(relu(acc_i32 * (sa*ws[c]/sa') + b[c]/sa')))

(sa' the next conv's activation scale; ReLU commutes with the positive
scale) — so intermediate activations never materialise in float.  Only the
block output (which feeds the residual add) is produced in f32/bf16, and
only the block input pays a separate quantize multiply.

Reference topology: layer1 bottlenecks lib/models/pose_hrnet.py:292 and
BasicBlock branches lib/models/pose_hrnet.py:28-57 of the upstream repo.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I8_MIN, _I8_MAX = -127.0, 127.0


def _quant(x_f32, inv_sa):
    """f32 -> int8 with symmetric scale (inv_sa = 1/sa, possibly (1,1))."""
    return jnp.clip(jnp.round(x_f32 * inv_sa), _I8_MIN, _I8_MAX
                    ).astype(jnp.int8)


def _requant_epilogue(acc_i32, a, c, relu=True):
    """acc -> int8 via the folded affine a[c]*acc + c[c] (+ReLU)."""
    y = acc_i32.astype(jnp.float32) * a + c
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), _I8_MIN, _I8_MAX).astype(jnp.int8)


def _cols3x3_int8(xq, tb, h, w, c):
    """im2col for a 3x3/s1 conv on an int8 (TB,H,W,C) tile -> (TB*H*W, 9C)."""
    xpad = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [xpad[:, di:di + h, dj:dj + w, :].reshape(tb * h * w, c)
         for di in range(3) for dj in range(3)], axis=1)


# --------------------------------------------------------------------------
# layer1: 4-bottleneck chain
# --------------------------------------------------------------------------

_BOT_NAMES = ("kq1", "a1", "c1", "kq2", "a2", "c2", "kq3", "a3", "c3")
_SC_NAMES = ("kqs", "as_", "cs")


def _bottleneck_int8_body(x, params, has_shortcut):
    """One W8A8 bottleneck on a (TB, H, W, Cin) bf16 VMEM value.

    params: kq1 (Cin,Cm) i8, a1/c1 (Cm,) f32 (folded with inv_sa2),
    kq2 (9Cm,Cm) i8, a2/c2 (Cm,) f32 (folded with inv_sa3),
    kq3 (Cm,Cout) i8, a3/c3 (Cout,) f32 (plain dequant),
    inv1 (1,1) f32, optional kqs (Cin,Cout) i8 + as_/cs (Cout,) f32.
    """
    tb, h, w, cin = x.shape
    flat = x.reshape(tb * h * w, cin).astype(jnp.float32)
    xq = _quant(flat, params["inv1"][0, 0])

    acc = jnp.dot(xq, params["kq1"], preferred_element_type=jnp.int32)
    yq = _requant_epilogue(acc, params["a1"], params["c1"])       # (N, Cm) i8
    cm = yq.shape[-1]

    cols = _cols3x3_int8(yq.reshape(tb, h, w, cm), tb, h, w, cm)  # (N, 9Cm)
    acc = jnp.dot(cols, params["kq2"], preferred_element_type=jnp.int32)
    yq = _requant_epilogue(acc, params["a2"], params["c2"])       # (N, Cm) i8

    acc = jnp.dot(yq, params["kq3"], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * params["a3"] + params["c3"]   # (N, Cout)

    if has_shortcut:
        acc = jnp.dot(xq, params["kqs"], preferred_element_type=jnp.int32)
        sc = acc.astype(jnp.float32) * params["as_"] + params["cs"]
    else:
        sc = flat
    return jnp.maximum(out + sc, 0.0).astype(jnp.bfloat16).reshape(
        tb, h, w, -1)


def _make_bottleneck_kernel(n_blocks: int, shortcut_flags: Tuple[bool, ...]):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        param_refs = refs[:-1]
        x = x_ref[...]
        idx = 0
        for b in range(n_blocks):
            names = ["inv1"] + list(_BOT_NAMES)
            if shortcut_flags[b]:
                names += list(_SC_NAMES)
            params = {}
            for name in names:
                params[name] = param_refs[idx][...]
                idx += 1
            x = _bottleneck_int8_body(x, params, shortcut_flags[b])
        out_ref[...] = x

    return kernel


@partial(jax.jit, static_argnames=("shortcut_flags", "out_channels",
                                   "interpret", "samples_per_program"))
def fused_bottleneck_chain_int8(
        x: jax.Array, params_flat: Tuple[jax.Array, ...],
        shortcut_flags: Tuple[bool, ...] = (True, False, False, False),
        out_channels: int = 256, interpret: bool = False,
        samples_per_program: int = 1) -> jax.Array:
    """x: (B, H, W, Cin) bf16 -> (B, H, W, out_channels) bf16, W8A8 MXU."""
    b, h, w, cin = x.shape
    tb = samples_per_program if b % samples_per_program == 0 else 1
    kernel = _make_bottleneck_kernel(len(shortcut_flags),
                                     tuple(shortcut_flags))
    in_specs = [pl.BlockSpec((tb, h, w, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params_flat]
    return pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, h, w, out_channels),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, out_channels), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, *params_flat)


# --------------------------------------------------------------------------
# BasicBlock branch chains
# --------------------------------------------------------------------------

def _basic_int8_body(x, inv1, kq1, a1, c1, kq2, a2, c2):
    """One W8A8 BasicBlock on a (TB, H, W, C) bf16 tile:
    relu(deq(conv(q(relu(deq(conv(q(x))))))) + x)."""
    tb, h, w, c = x.shape
    xq = _quant(x.astype(jnp.float32), inv1[0, 0])
    cols = _cols3x3_int8(xq, tb, h, w, c)
    acc = jnp.dot(cols, kq1, preferred_element_type=jnp.int32)
    yq = _requant_epilogue(acc, a1, c1)                           # (N, C) i8

    cols = _cols3x3_int8(yq.reshape(tb, h, w, c), tb, h, w, c)
    acc = jnp.dot(cols, kq2, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * a2 + c2
    out = out + x.reshape(tb * h * w, c).astype(jnp.float32)
    return jnp.maximum(out, 0.0).astype(jnp.bfloat16).reshape(tb, h, w, c)


def _make_basic_int8_kernel(n_blocks: int):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        param_refs = refs[:-1]
        x = x_ref[...]
        for b in range(n_blocks):
            args = [param_refs[7 * b + i][...] for i in range(7)]
            x = _basic_int8_body(x, *args)
        out_ref[...] = x

    return kernel


@partial(jax.jit, static_argnames=("n_blocks", "samples_per_block",
                                   "interpret"))
def fused_basic_chain_int8(x: jax.Array,
                           params_flat: Tuple[jax.Array, ...],
                           n_blocks: int, samples_per_block: int = 1,
                           interpret: bool = False) -> jax.Array:
    """Chain of W8A8 BasicBlocks in one VMEM pass.

    x: (B, H, W, C) bf16; params_flat: per block
    (inv1 (1,1), kq1 (9C,C) i8, a1 (C,), c1 (C,), kq2 (9C,C) i8,
     a2 (C,), c2 (C,)) — a1/c1 folded with the second conv's inv_sa.
    ``samples_per_block`` folds samples into one grid program for the
    small-spatial branches.
    """
    b, h, w, c = x.shape
    tb = samples_per_block if b % samples_per_block == 0 else 1
    kernel = _make_basic_int8_kernel(n_blocks)
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


# --------------------------------------------------------------------------
# offline parameter preparation (imports core/quant_infer's scheme — ONE
# quantization definition, so the '<0.1 px, same scheme' contract holds)
# --------------------------------------------------------------------------

def prepare_layer1_int8(variables, amax: Dict[str, float]
                        ) -> Tuple[Tuple[jax.Array, ...], Tuple[bool, ...]]:
    """Fold + quantize layer1 into ``fused_bottleneck_chain_int8`` layout.

    ``amax``: calibration records from ``core.quant_infer.calibrate`` (the
    layer1/* sites; recorded by the folded-walk calibration pass).
    """
    from ...core.quant_infer import (_fold, quantize_weight as
                                     _quantize_weight, site_scale as
                                     _site_scale)

    p = variables["params"]["backbone"]["layer1"]
    s = variables["batch_stats"]["backbone"]["layer1"]
    flat: List[jax.Array] = []
    flags: List[bool] = []
    for bidx in range(4):
        blk_p, blk_s = p[f"block{bidx}"], s[f"block{bidx}"]
        sa1 = _site_scale(amax, f"layer1/block{bidx}/cb1")
        sa2 = _site_scale(amax, f"layer1/block{bidx}/cb2")
        sa3 = _site_scale(amax, f"layer1/block{bidx}/cb3")

        k1, b1 = _fold(blk_p["cb1"], blk_s["cb1"])
        k2, b2 = _fold(blk_p["cb2"], blk_s["cb2"])
        k3, b3 = _fold(blk_p["cb3"], blk_s["cb3"])
        kq1, ws1 = _quantize_weight(np.asarray(k1)[0, 0])
        kq2, ws2 = _quantize_weight(np.asarray(k2))
        kq3, ws3 = _quantize_weight(np.asarray(k3)[0, 0])
        cm = kq1.shape[-1]

        flat += [
            jnp.full((1, 1), 1.0 / sa1, jnp.float32),             # inv1
            jnp.asarray(kq1),
            jnp.asarray(sa1 * ws1 / sa2, jnp.float32),            # a1
            jnp.asarray(np.asarray(b1, np.float32) / sa2),        # c1
            jnp.asarray(kq2.reshape(9 * cm, cm)),
            jnp.asarray(sa2 * ws2 / sa3, jnp.float32),            # a2
            jnp.asarray(np.asarray(b2, np.float32) / sa3),        # c2
            jnp.asarray(kq3),
            jnp.asarray(sa3 * ws3, jnp.float32),                  # a3
            jnp.asarray(np.asarray(b3, np.float32)),              # c3
        ]
        if "downsample" in blk_p:
            ks, bs = _fold(blk_p["downsample"], blk_s["downsample"])
            kqs, wss = _quantize_weight(np.asarray(ks)[0, 0])
            # downsample shares the block input (and so its scale) with cb1
            flat += [jnp.asarray(kqs),
                     jnp.asarray(sa1 * wss, jnp.float32),
                     jnp.asarray(np.asarray(bs, np.float32))]
            flags.append(True)
        else:
            flags.append(False)
    return tuple(flat), tuple(flags)


def prepare_branch_int8(variables, amax: Dict[str, float], mod: str,
                        branch: int, n_blocks: int
                        ) -> Tuple[jax.Array, ...]:
    """Fold + quantize one stage branch chain into
    ``fused_basic_chain_int8`` layout.  Sites: {mod}/branch{i}/block{b}/cb*.
    """
    from ...core.quant_infer import (_fold, quantize_weight as
                                     _quantize_weight, site_scale as
                                     _site_scale)

    p = variables["params"]["backbone"][mod][f"branch{branch}"]
    s = variables["batch_stats"]["backbone"][mod][f"branch{branch}"]
    flat: List[jax.Array] = []
    for bidx in range(n_blocks):
        blk_p, blk_s = p[f"block{bidx}"], s[f"block{bidx}"]
        sa1 = _site_scale(amax, f"{mod}/branch{branch}/block{bidx}/cb1")
        sa2 = _site_scale(amax, f"{mod}/branch{branch}/block{bidx}/cb2")
        k1, b1 = _fold(blk_p["cb1"], blk_s["cb1"])
        k2, b2 = _fold(blk_p["cb2"], blk_s["cb2"])
        kq1, ws1 = _quantize_weight(np.asarray(k1))
        kq2, ws2 = _quantize_weight(np.asarray(k2))
        c = kq1.shape[-1]
        flat += [
            jnp.full((1, 1), 1.0 / sa1, jnp.float32),
            jnp.asarray(kq1.reshape(9 * c, c)),
            jnp.asarray(sa1 * ws1 / sa2, jnp.float32),
            jnp.asarray(np.asarray(b1, np.float32) / sa2),
            jnp.asarray(kq2.reshape(9 * c, c)),
            jnp.asarray(sa2 * ws2, jnp.float32),
            jnp.asarray(np.asarray(b2, np.float32)),
        ]
    return tuple(flat)


# --------------------------------------------------------------------------
# pure-JAX references (parity tests)
# --------------------------------------------------------------------------

def bottleneck_chain_int8_reference(x, params_flat, shortcut_flags):
    """XLA reference with byte-identical quantization math."""
    idx = 0
    y = x
    for has_sc in shortcut_flags:
        names = ["inv1"] + list(_BOT_NAMES) + (
            list(_SC_NAMES) if has_sc else [])
        p = {}
        for n in names:
            p[n] = params_flat[idx]
            idx += 1
        b, h, w, cin = y.shape
        y = _bottleneck_int8_body(y.reshape(b, h, w, cin), p, has_sc)
    return y


def basic_chain_int8_reference(x, params_flat, n_blocks):
    y = x
    for bidx in range(n_blocks):
        args = params_flat[7 * bidx: 7 * (bidx + 1)]
        y = _basic_int8_body(y, *args)
    return y
