"""Pallas TPU kernel: fused HRNet head + softmax decode.

PERF.md's ablation: the head (bilinear upsample x3 -> 480ch concat -> 1x1
conv -> BN/ReLU -> final conv -> spatial softmax -> soft-argmax) costs
7.6 ms of the 35 ms step at B=128 — almost all HBM traffic through ~2-3 GB
of full-resolution intermediates.

This kernel runs the ENTIRE head per sample inside VMEM in a channels-major
(C, HW) layout chosen for Mosaic:
- align-corners bilinear upsampling is ONE matmul per branch with a
  precomputed Kronecker interpolation matrix  M = kron(Wh, Ww)^T
  ((s*s, h0*w0)): up(x) = x @ M for x (C, s*s)
- the 1x1 head convs are plain matmuls on the channel axis
- softmax + expectation reduce over lanes (HW), the proven-safe layout
  (sublane-axis reductions of unaligned shapes mis-reduce)

HBM sees the four native-resolution branch tensors in (channels-major,
pre-transposed by XLA — ~0.5 MB/sample) and (K, 2) coordinates out; no
full-resolution intermediate ever leaves the core.

Assumes folded BatchNorm (``prepare_head_params``); eval-exact.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..upsample import _align_corners_matrix


class HeadParams(NamedTuple):
    w_head: jax.Array    # (480, 480) folded head conv
    b_head: jax.Array    # (480,)
    w_final: jax.Array   # (480, K)
    b_final: jax.Array   # (K,)
    temp: jax.Array      # () softmax temperature


@lru_cache(maxsize=None)
def _kron_interp(src: int, dst: int) -> np.ndarray:
    """(src*src, dst*dst) matrix: x(C, src^2) @ M = align-corners bilinear
    upsample flattened to (C, dst^2)."""
    w = _align_corners_matrix(src, dst)          # (dst, src)
    return np.kron(w, w).T.astype(np.float32)    # (src^2, dst^2)


def _kernel(temp_ref, x0_ref, x1_ref, x2_ref, x3_ref,
            m1_ref, m2_ref, m3_ref,
            whead_ref, bhead_ref, wfinal_ref, bfinal_ref,
            u_ref, v_ref, w0_static):
    hp = jnp.float32

    def up(x_ref, m_ref):
        return jnp.dot(x_ref[0], m_ref[...],
                       preferred_element_type=hp).astype(jnp.bfloat16)

    feat = jnp.concatenate(
        [x0_ref[0], up(x1_ref, m1_ref), up(x2_ref, m2_ref), up(x3_ref, m3_ref)],
        axis=0)                                            # (480, HW) bf16

    y = jnp.dot(whead_ref[...], feat, preferred_element_type=hp)
    y = jnp.maximum(y + bhead_ref[...][:, None], 0.0).astype(jnp.bfloat16)
    logits = jnp.dot(wfinal_ref[...], y, preferred_element_type=hp)
    logits = (logits + bfinal_ref[...][:, None]) * temp_ref[0]   # (K, HW)

    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=1)
    hw = logits.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    us = (idx % w0_static).astype(hp)
    vs = (idx // w0_static).astype(hp)
    k = logits.shape[0]
    pad = 128 - k
    u_ref[0] = jnp.pad((jnp.sum(e * us, axis=1) / s)[None], ((0, 0), (0, pad)))
    v_ref[0] = jnp.pad((jnp.sum(e * vs, axis=1) / s)[None], ((0, 0), (0, pad)))


@partial(jax.jit, static_argnames=("interpret",))
def fused_head_decode(xs: Sequence[jax.Array], params: HeadParams,
                      interpret: bool = False) -> jax.Array:
    """xs: 4 NHWC branch tensors (B, h0/2^i, w0/2^i, Ci) -> (B, K, 2)."""
    b, h0, w0, _ = xs[0].shape
    k = params.w_final.shape[1]
    # channels-major, spatial flattened (cheap XLA transposes at native res)
    xs_cm = [x.astype(jnp.bfloat16).transpose(0, 3, 1, 2)
             .reshape(b, x.shape[3], x.shape[1] * x.shape[2]) for x in xs]
    mats = [jnp.asarray(_kron_interp(x.shape[1], h0)).astype(jnp.bfloat16)
            for x in xs[1:]]
    temp = jnp.asarray(params.temp, jnp.float32).reshape(1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for x in xs_cm:
        c, n = x.shape[1:]
        in_specs.append(pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    for _ in mats:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    for _ in range(4):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    u, v = pl.pallas_call(
        partial(_kernel, w0_static=w0),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(temp, *xs_cm, *mats,
      params.w_head.T.astype(jnp.bfloat16), params.b_head.astype(jnp.float32),
      params.w_final.T.astype(jnp.bfloat16), params.b_final.astype(jnp.float32))
    return jnp.stack([u[:, 0, :k], v[:, 0, :k]], axis=-1)


@lru_cache(maxsize=None)
def _row_taps(src: int, dst: int):
    """Static 2-tap decomposition of the align-corners matrix rows:
    taps[d] = (i0, a, b) with  out[d] = a*x[i0] + b*x[i0+1]."""
    m = _align_corners_matrix(src, dst)          # (dst, src)
    taps = []
    for d in range(dst):
        nz = np.nonzero(m[d])[0]
        i0 = int(min(nz[0], src - 2))
        taps.append((i0, float(m[d, i0]), float(m[d, i0 + 1])))
    return tuple(taps)


def _kernel_v2(temp_ref, x0_ref, x1_ref, x2_ref, x3_ref,
               w0_ref, w1_ref, w2_ref, w3_ref, bhead_ref,
               uw1_ref, uw2_ref, uw3_ref,
               wfinal_ref, bfinal_ref, out_ref, *, hw_shapes, w0_static, spp):
    """Head v2: commuted 1x1 conv + separable align-corners upsample.

    The reference head (pose_hrnet.py:333-348) upsamples+concats 480ch, then
    1x1 convs 480->480.  A 1x1 conv distributes over the channel concat and
    commutes with (linear) bilinear interpolation, so we conv each branch at
    NATIVE resolution with its kernel row-slice (8x fewer conv FLOPs) and
    upsample the 480ch results separably (~10x fewer upsample FLOPs than the
    dense Kronecker matmul): W-mix as one small matmul per source row, H-mix
    as static two-tap FMAs over the row tiles (Mosaic supports neither 3D
    dot_generals nor lane-folding reshapes, so everything stays 2D with
    leading-dim slicing only).  Inputs are read HW-major straight from the
    NHWC tensors — no XLA-side transposes.
    """
    hp = jnp.float32
    h0, w0 = hw_shapes[0]

    def load(x_ref, n):
        x = x_ref[n]
        # int8 inputs (halved HBM reads): dequant scales are folded into the
        # per-branch kernel slices offline, so a plain cast suffices here
        return x.astype(jnp.bfloat16) if x.dtype == jnp.int8 else x

    for n in range(spp):
        # branch 0 at full res: (HW, C0) @ (C0, 480)
        acc = jnp.dot(load(x0_ref, n), w0_ref[...], preferred_element_type=hp)

        # per-branch W-mixed row tiles: t[h] = Uw @ y[h]  -- (w0, 480) each
        branch_rows = []
        for x_ref, w_ref, uw_ref, (h, w) in (
                (x1_ref, w1_ref, uw1_ref, hw_shapes[1]),
                (x2_ref, w2_ref, uw2_ref, hw_shapes[2]),
                (x3_ref, w3_ref, uw3_ref, hw_shapes[3])):
            y = jnp.dot(load(x_ref, n), w_ref[...],
                        preferred_element_type=hp).astype(jnp.bfloat16)
            tiles = [jnp.dot(uw_ref[...], y[r * w:(r + 1) * w, :],
                             preferred_element_type=hp) for r in range(h)]
            branch_rows.append((tiles, _row_taps(h, h0)))

        # H-mix: out row d = sum over branches of (a*t[i0] + b*t[i0+1])
        rows = []
        for d in range(h0):
            r = None
            for tiles, taps in branch_rows:
                i0, a, b = taps[d]
                contrib = tiles[i0] * a + tiles[i0 + 1] * b
                r = contrib if r is None else r + contrib
            rows.append(r)
        acc = acc + jnp.concatenate(rows, axis=0)

        y = jnp.maximum(acc + bhead_ref[...][None, :], 0.0).astype(jnp.bfloat16)
        logits = jnp.dot(y, wfinal_ref[...], preferred_element_type=hp)
        logits = (logits + bfinal_ref[...][None, :]) * temp_ref[0]  # (HW, 128pad)

        m = jnp.max(logits, axis=0, keepdims=True)
        # pad cols hold a constant -1e30*temp: after per-column max
        # subtraction their exp() is 1 (constant - its own max = 0), i.e.
        # pad columns carry garbage — correctness relies on the caller
        # slicing them off, never on them being zero
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=0)
        hw = logits.shape[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
        us = (idx % w0_static).astype(hp)
        vs = (idx // w0_static).astype(hp)
        out_ref[n, 0] = jnp.sum(e * us, axis=0) / s
        out_ref[n, 1] = jnp.sum(e * vs, axis=0) / s


@partial(jax.jit, static_argnames=("interpret", "samples_per_program"))
def fused_head_decode_v2(xs: Sequence[jax.Array], params: HeadParams,
                         interpret: bool = False,
                         samples_per_program: int = 4,
                         input_scales: Sequence[jax.Array] | None = None
                         ) -> jax.Array:
    """xs: 4 NHWC branch tensors (B, h0/2^i, w0/2^i, Ci) -> (B, K, 2).

    Same math as ``fused_head_decode`` (eval-exact head + softmax soft-argmax)
    with the commuted-conv / separable-upsample formulation; reads the NHWC
    branch tensors directly (no channels-major pre-transpose).  Several
    samples per grid program amortise the per-program pipeline overhead.

    ``input_scales``: per-branch symmetric int8 scales.  When given, ``xs``
    must be int8 (B, h, w, Ci) tensors (``x_bf16 ~= sa_i * x_int8``); the
    dequant folds into the per-branch kernel slices (the 1x1 head conv is
    linear in its input), so the kernel just casts after the halved-size
    loads — the head is input-read-bound (PERF.md).
    """
    b, h0, w0, _ = xs[0].shape
    k = params.w_final.shape[1]
    hw_shapes = tuple((x.shape[1], x.shape[2]) for x in xs)
    spp = samples_per_program if b % samples_per_program == 0 else 1

    if input_scales is None:
        xs_flat = [x.astype(jnp.bfloat16).reshape(
            b, x.shape[1] * x.shape[2], x.shape[3]) for x in xs]
    else:
        assert all(x.dtype == jnp.int8 for x in xs), \
            "input_scales given: xs must be int8"
        xs_flat = [x.reshape(b, x.shape[1] * x.shape[2], x.shape[3])
                   for x in xs]
    # per-branch slices of the folded head kernel (480_in -> 480_out)
    w_head = params.w_head.astype(jnp.float32)
    offs = np.cumsum([0] + [x.shape[-1] for x in xs])
    w_slices = [w_head[offs[i]:offs[i + 1]] for i in range(4)]
    if input_scales is not None:
        w_slices = [w * jnp.asarray(sa, jnp.float32)
                    for w, sa in zip(w_slices, input_scales)]
    w_slices = [w.astype(jnp.bfloat16) for w in w_slices]
    # W-mix interpolation matrices (H-mix taps are baked in statically), bf16
    ups = [jnp.asarray(_align_corners_matrix(w, w0)).astype(jnp.bfloat16)
           for (h, w) in hw_shapes[1:]]
    # final conv padded to 128 lanes; pad columns hold a constant huge-negative
    # bias, so after the per-column max subtraction they produce garbage
    # (exp(0)=1), NOT zeros — correctness relies on the caller slicing the pad
    # columns off, never on their values
    pad = 128 - k
    w_final = jnp.pad(params.w_final.astype(jnp.bfloat16), ((0, 0), (0, pad)))
    b_final = jnp.pad(params.b_final.astype(jnp.float32), (0, pad),
                      constant_values=-1e30)
    temp = jnp.asarray(params.temp, jnp.float32).reshape(1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for x in xs_flat:
        n, c = x.shape[1:]
        in_specs.append(pl.BlockSpec((spp, n, c), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (4 + 1 + 3 + 2)

    out = pl.pallas_call(
        partial(_kernel_v2, hw_shapes=hw_shapes, w0_static=w0, spp=spp),
        grid=(b // spp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((spp, 2, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(temp, *xs_flat, *w_slices, params.b_head.astype(jnp.float32),
      *ups, w_final, b_final)
    return out[:, :, :k].transpose(0, 2, 1)


def prepare_head_params(variables, eps: float = 1e-5,
                        temperature: float | jax.Array = 1.0) -> HeadParams:
    """Fold head_cb's BN into its conv and pack final-conv weights.

    variables: full PoseHRNet tree (params + batch_stats), UNfolded.
    """
    p = variables["params"]
    s = variables["batch_stats"]
    conv = p["head_cb"]["conv"]
    bn = p["head_cb"]["bn"]
    st = s["head_cb"]["bn"]
    inv = bn["scale"] / jnp.sqrt(st["var"] + eps)
    w_head = conv["kernel"][0, 0] * inv
    b_head = (conv.get("bias", 0.0) - st["mean"]) * inv + bn["bias"]
    w_final = p["final_conv"]["kernel"][0, 0]
    b_final = p["final_conv"].get("bias", jnp.zeros(w_final.shape[1]))
    temp = p.get("trainable_temp", jnp.asarray(temperature))
    return HeadParams(w_head, b_head, w_final, b_final, jnp.asarray(temp))
