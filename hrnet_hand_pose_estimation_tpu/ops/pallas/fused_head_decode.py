"""Pallas TPU kernel: fused HRNet head + softmax decode.

PERF.md's ablation: the head (bilinear upsample x3 -> 480ch concat -> 1x1
conv -> BN/ReLU -> final conv -> spatial softmax -> soft-argmax) costs
7.6 ms of the 35 ms step at B=128 — almost all HBM traffic through ~2-3 GB
of full-resolution intermediates.

This kernel runs the ENTIRE head per sample inside VMEM: align-corners
bilinear upsampling becomes two small interpolation matmuls per branch
(ops/upsample.py's einsum formulation), the 1x1 convs are (4096, C)
matmuls, and the softmax expectations reduce in-register.  HBM sees only
the four native-resolution branch tensors in (~0.5 MB/sample) and (K, 2)
coordinates out.

Assumes folded BatchNorm (weights prepared by ``prepare_head_params`` from
a fold_bn'd checkpoint — exact for eval).  Output parity vs the XLA head
is bf16-rounding-level.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

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


def _kernel(temp_ref, x0_ref, x1_ref, x2_ref, x3_ref,
            wh1_ref, wh2_ref, wh3_ref,
            whead_ref, bhead_ref, wfinal_ref, bfinal_ref,
            u_ref, v_ref):
    h0, w0, c0 = x0_ref.shape[1:]
    hp = jnp.float32

    def upsample(x_ref, wh_ref):
        """align-corners bilinear via two interp matmuls: (s,s,C) -> (h0,w0,C)."""
        x = x_ref[0]
        s, _, c = x.shape
        wh = wh_ref[...]                                   # (h0, s)
        t = jnp.dot(wh, x.reshape(s, s * c),
                    preferred_element_type=hp)             # (h0, s*c)
        t = t.reshape(h0, s, c).transpose(1, 0, 2).reshape(s, h0 * c)
        t = jnp.dot(wh, t, preferred_element_type=hp)      # (w0, h0*c)
        return t.reshape(w0, h0, c).transpose(1, 0, 2)     # (h0, w0, c)

    parts = [x0_ref[0].astype(hp),
             upsample(x1_ref, wh1_ref),
             upsample(x2_ref, wh2_ref),
             upsample(x3_ref, wh3_ref)]
    feat = jnp.concatenate(parts, axis=-1).reshape(h0 * w0, -1).astype(jnp.bfloat16)

    y = jnp.dot(feat, whead_ref[...], preferred_element_type=hp)
    y = jnp.maximum(y + bhead_ref[...], 0.0).astype(jnp.bfloat16)
    logits = jnp.dot(y, wfinal_ref[...], preferred_element_type=hp)
    logits = (logits + bfinal_ref[...]) * temp_ref[0]      # (HW, K)

    # reduce over lanes: (K, HW) layout — sublane-axis reductions of
    # unaligned (HW, 21) shapes mis-reduce on TPU (see decode_kernel)
    lt = logits.T                                          # (K, HW)
    m = jnp.max(lt, axis=1, keepdims=True)
    e = jnp.exp(lt - m)                                    # (K, HW)
    s = jnp.sum(e, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, h0 * w0), 1)
    us = (idx % w0).astype(hp)
    vs = (idx // w0).astype(hp)
    k = lt.shape[0]
    pad = 128 - k
    u_ref[...] = jnp.pad((jnp.sum(e * us, axis=1) / s)[None], ((0, 0), (0, pad)))
    v_ref[...] = jnp.pad((jnp.sum(e * vs, axis=1) / s)[None], ((0, 0), (0, pad)))


@partial(jax.jit, static_argnames=("interpret",))
def fused_head_decode(xs: Sequence[jax.Array], params: HeadParams,
                      interpret: bool = False) -> jax.Array:
    """xs: 4 branch tensors (B, h0/2^i, w0/2^i, Ci) -> (B, K, 2) coords."""
    b, h0, w0, _ = xs[0].shape
    k = params.w_final.shape[1]
    whs = [jnp.asarray(_align_corners_matrix(x.shape[1], h0)) for x in xs[1:]]
    temp = jnp.asarray(params.temp, jnp.float32).reshape(1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for x in xs:
        s = x.shape[1]
        c = x.shape[3]
        in_specs.append(pl.BlockSpec((1, s, s, c), lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    for _ in whs:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    for _ in range(4):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    u, v = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(temp, *[x.astype(jnp.bfloat16) for x in xs], *whs,
      params.w_head.astype(jnp.bfloat16), params.b_head.astype(jnp.float32),
      params.w_final.astype(jnp.bfloat16), params.b_final.astype(jnp.float32))
    return jnp.stack([u[:, :k], v[:, :k]], axis=-1)


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
