"""Deformable convolution (v1/v2), TPU-native.

Replaces the reference's C++/CUDA torch extension
(lib/deformable_conv/src/*.cu ``deform_im2col`` kernels, pybind11 module
vision.cpp:6-13, autograd wrappers functions/*.py) with a pure-XLA
formulation: for each of the kh*kw kernel taps, bilinearly sample the
input at the offset-shifted tap position (one vectorised gather per tap)
and contract with that tap's weights (one matmul per tap — MXU work).
Gradients flow through the gathers and the bilinear weights automatically,
covering the extension's hand-written backward including offset gradients.

Modulated (v2) masks multiply the sampled values per tap (the
``modulated_deform_conv`` entry points).

Semantics checked against the extension's own unit tests
(lib/deformable_conv/test.py): zero offsets == plain convolution
(test.py:36 check_dconv_zero_offset), all-ones mask reduces v2 to v1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .volumetric import bilinear_sample_nhwc


def deform_conv2d(
    x: jax.Array,
    offsets: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jax.Array:
    """x: (B, H, W, Cin); offsets: (B, Ho, Wo, G*2*kh*kw) ordered
    (group, tap row-major, (dy, dx)) — the extension's layout; weight:
    (kh, kw, Cin, Cout); mask: (B, Ho, Wo, G*kh*kw) for the modulated
    variant.  ``deformable_groups`` splits the INPUT channels into G groups,
    each sampled with its own offset field (reference
    deformable_conv/functions/deform_conv.py; PoseAggr uses G=num_joints,
    pose_hrnet_PoseAggr.py:381-385).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    cg = cin // g
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    base_x = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    grid_y = jnp.broadcast_to(base_y[:, None], (ho, wo))
    grid_x = jnp.broadcast_to(base_x[None, :], (ho, wo))

    off = offsets.astype(jnp.float32).reshape(b, ho, wo, g, kh * kw, 2)
    if mask is not None:
        mask = mask.reshape(b, ho, wo, g, kh * kw)
    # group-major batch fold: every (sample, group) pair samples independently
    xg = (x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4)
          .reshape(b * g, h, w, cg))
    wg = weight.reshape(kh, kw, g, cg, cout)
    out = jnp.zeros((b, ho, wo, cout), jnp.float32)
    for ki in range(kh):
        for kj in range(kw):
            tap = ki * kw + kj
            py = grid_y[None, None] + ki * dilation + off[..., tap, 0].transpose(0, 3, 1, 2)
            px = grid_x[None, None] + kj * dilation + off[..., tap, 1].transpose(0, 3, 1, 2)
            # py/px: (B, G, Ho, Wo) after the transpose above
            coords = jnp.stack([px, py], axis=-1).reshape(b * g, ho * wo, 2)
            sampled = bilinear_sample_nhwc(xg, coords)      # (BG, HoWo, Cg)
            sampled = sampled.reshape(b, g, ho * wo, cg)
            if mask is not None:
                sampled = sampled * mask[..., tap].transpose(0, 3, 1, 2).reshape(
                    b, g, ho * wo, 1)
            out = out + jnp.einsum(
                "bgnc,gco->bno", sampled.astype(jnp.float32),
                wg[ki, kj].astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


def plain_conv2d_reference(x, weight, bias=None, stride=1, padding=1, dilation=1):
    """Ordinary conv with the same layout — the zero-offset oracle."""
    dn = jax.lax.conv_dimension_numbers(x.shape, weight.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), weight.astype(jnp.float32),
        (stride, stride), [(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST)
    if bias is not None:
        out = out + bias
    return out
