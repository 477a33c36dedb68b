"""Pallas TPU kernel: fused spatial-softmax + soft-argmax decode.

The XLA path (ops/decode.py) materialises the (B, H, W, K) probability
tensor in HBM (softmax write + two einsum reads).  This kernel fuses the
whole decode — max, exp-sum, and the two coordinate expectations — into a
single VMEM-resident pass per batch element: logits are read from HBM once
and only (B, K) coordinate outputs are written back.

One grid program per batch element; the (H, W, K) block (64*64*21 f32 =
344 KiB) sits in VMEM, far under the ~16 MiB budget.  Reductions ride the
VPU; no MXU work.  Numerics match the reference decomposition
``spatial_softmax -> soft_argmax`` (kornia spatial_expectation2d semantics,
reference lib/utils/heatmap_decoding.py:99-101) to f32 rounding.

Falls back to the XLA composition automatically off-TPU (tests run the
kernel in interpreter mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANES = 128  # TPU lane width; K pads up to this in the kernel outputs


def _decode_kernel(w_ref, temp_ref, logits_ref, u_ref, v_ref):
    """logits_ref: (TB, K, HW) — spatial on lanes (K on lanes pads 21->128
    and blows VMEM 6x); u_ref/v_ref: (TB, 128) (K zero-padded)."""
    x = logits_ref[...].astype(jnp.float32) * temp_ref[0]        # (TB, K, HW)
    tb, k, hw = x.shape
    w = w_ref[0]
    m = jnp.max(x, axis=2, keepdims=True)
    e = jnp.exp(x - m)                                           # (TB, K, HW)
    s = jnp.sum(e, axis=2)                                       # (TB, K)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hw), 2)
    us = (idx % w).astype(jnp.float32)
    vs = (idx // w).astype(jnp.float32)
    eu = jnp.sum(e * us, axis=2) / s                             # (TB, K)
    ev = jnp.sum(e * vs, axis=2) / s
    pad = _LANES - k
    u_ref[...] = jnp.pad(eu, ((0, 0), (0, pad)))
    v_ref[...] = jnp.pad(ev, ((0, 0), (0, pad)))


@partial(jax.jit, static_argnames=("interpret",))
def fused_softmax_decode(logits: jax.Array, temperature: jax.Array | float = 1.0,
                         interpret: bool = False) -> jax.Array:
    """logits: (B, H, W, K) raw heatmap logits -> (B, K, 2) [u, v] coords.

    Equivalent to ``soft_argmax(spatial_softmax(logits, temperature))``.
    Processes 8 samples per grid program (TPU sublane alignment); batches
    not divisible by 8 are padded.
    """
    b, h, w, k = logits.shape
    x = logits.transpose(0, 3, 1, 2).reshape(b, k, h * w)
    pad_b = (-b) % 8
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    tb = 8
    nb = x.shape[0]
    temp = jnp.asarray(temperature, jnp.float32).reshape(1)
    width = jnp.asarray([w], jnp.int32)
    u, v = pl.pallas_call(
        _decode_kernel,
        grid=(nb // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, k, h * w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nb, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(width, temp, x)
    return jnp.stack([u[:b, :k], v[:b, :k]], axis=-1)


def _targets_kernel(coords_ref, vis_ref, params_ref, out_ref):
    """Gaussian stamping: coords_ref (1, K, 2) f32, vis (1, K), out (1, H, W, K).

    params_ref (SMEM): [sigma, win] as f32.
    """
    sigma = params_ref[0]
    win = params_ref[1]
    h, w, k = out_ref.shape[1:]
    x = jnp.trunc(coords_ref[0, :, 0]).astype(jnp.float32)       # (K,)
    y = jnp.trunc(coords_ref[0, :, 1]).astype(jnp.float32)
    valid = (vis_ref[0] > 0) & (x >= 0) & (y >= 0) & (x < w) & (y < h)

    px = jax.lax.broadcasted_iota(jnp.int32, (h, w, k), 1).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w, k), 0).astype(jnp.float32)
    dx = px - x[None, None, :]
    dy = py - y[None, None, :]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    mask = (jnp.abs(dx) <= win) & (jnp.abs(dy) <= win) & valid[None, None, :]
    out_ref[0] = g * mask.astype(jnp.float32)


@partial(jax.jit, static_argnames=("output_res", "sigma", "interpret"))
def fused_gaussian_targets(joints: jax.Array, visibility: jax.Array,
                           output_res: int, sigma: float = 2.0,
                           interpret: bool = False) -> jax.Array:
    """Pallas twin of ops/targets.gaussian_targets: (B, K, 2) -> (B, H, W, K).

    One VPU pass per sample; the (H, W, K) target block never round-trips
    through HBM intermediates.
    """
    b, k, _ = joints.shape
    params = jnp.asarray([float(sigma), float(int(3 * sigma + 1))], jnp.float32)
    return pl.pallas_call(
        _targets_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, output_res, output_res, k),
                               lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, output_res, output_res, k), jnp.float32),
        interpret=interpret,
    )(joints.astype(jnp.float32), visibility.astype(jnp.float32), params)
