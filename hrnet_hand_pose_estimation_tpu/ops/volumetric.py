"""Volumetric triangulation ops: coordinate volumes, unprojection, 3D soft-argmax.

TPU-native re-design of reference lib/models/triangulation_model_utils/
op.py:84-168 and volumetric.py:98-131.  The reference's
``unproject_heatmaps`` is a python double loop over (batch, view) calling
``F.grid_sample`` per pair; here the whole thing is one fused computation:
project every voxel of every sample through every view with one einsum,
bilinear-gather the feature maps (align_corners=True + zero padding,
matching grid_sample), and aggregate across views — no host round trips,
everything lands on MXU/VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_coord_volume(base_point: jax.Array, cuboid_size: float,
                       volume_size: int) -> jax.Array:
    """Axis-aligned cuboid of voxel-centre coordinates around a base point.

    base_point: (B, 3) world position (mm); the cuboid spans
    ``[base - size/2, base + size/2]`` (reference triangulation.py:407-456).
    Returns (B, S, S, S, 3) with meshgrid indexing='ij' (x, y, z axes).
    """
    s = volume_size
    xs = jnp.linspace(0.0, cuboid_size, s, dtype=jnp.float32) - cuboid_size / 2.0
    grid = jnp.stack(jnp.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)  # (S,S,S,3)
    return base_point[:, None, None, None, :] + grid[None]


def rotation_matrix(axis, theta: jax.Array) -> jax.Array:
    """Rodrigues rotation about ``axis`` by ``theta`` rad (reference
    volumetric.py:98-112, quaternion form)."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    a = jnp.cos(theta / 2.0)
    b, c, d = -axis[0] * jnp.sin(theta / 2.0), -axis[1] * jnp.sin(theta / 2.0), -axis[2] * jnp.sin(theta / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return jnp.stack([
        jnp.stack([aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac)]),
        jnp.stack([2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab)]),
        jnp.stack([2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc]),
    ])


def rotate_coord_volume(coord_volume: jax.Array, theta: jax.Array, axis,
                        center: Optional[jax.Array] = None) -> jax.Array:
    """Rotate voxel coordinates about ``center`` (reference applies the
    y-axis rotation about the cuboid centre during training,
    triangulation.py:437-448; volumetric.py:115-127 rotates about origin,
    the caller recentres).  coord_volume: (B, S, S, S, 3); theta: (B,)."""
    rot = jax.vmap(lambda t: rotation_matrix(axis, t))(theta)  # (B, 3, 3)
    if center is None:
        center = jnp.zeros((coord_volume.shape[0], 3), coord_volume.dtype)
    c = center[:, None, None, None, :]
    return jnp.einsum("bij,bxyzj->bxyzi", rot, coord_volume - c) + c


def bilinear_sample_nhwc(images: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling with zero padding, matching
    ``F.grid_sample(align_corners=True, padding_mode='zeros')`` after the
    caller converts normalised coords to pixel units.

    images: (..., H, W, C); coords: (..., N, 2) pixel [x, y].
    Returns (..., N, C).
    """
    h, w = images.shape[-3], images.shape[-2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(ix, iy):
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = images.reshape(*images.shape[:-3], h * w, images.shape[-1])
        idx = iyc * w + ixc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=-2)
        return vals * valid[..., None].astype(images.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    dxc = dx[..., None].astype(images.dtype)
    dyc = dy[..., None].astype(images.dtype)
    return (
        v00 * (1 - dxc) * (1 - dyc)
        + v01 * dxc * (1 - dyc)
        + v10 * (1 - dxc) * dyc
        + v11 * dxc * dyc
    )


def unproject_heatmaps(
    features: jax.Array,
    proj_matrices: jax.Array,
    coord_volumes: jax.Array,
    aggregation: str = "softmax",
    vol_confidences: Optional[jax.Array] = None,
) -> jax.Array:
    """Lift per-view feature maps into a shared 3D volume
    (reference op.py:99-168, loop-free).

    features: (B, V, H, W, C) — per-view heatmaps/features (NHWC)
    proj_matrices: (B, V, 3, 4) — heatmap-scale projections
    coord_volumes: (B, X, Y, Z, 3) — world voxel centres
    aggregation: 'sum' | 'max' | 'softmax' | 'conf'
    vol_confidences: (B, V, C) for 'conf' aggregation

    Matches the reference's grid_sample conventions exactly:
    normalised coords are ``2*(u/H - 0.5)`` (note: divides by H for the x
    axis too — a reference quirk kept for parity; square maps everywhere),
    align_corners=True, zero padding, voxels behind the camera zeroed.
    """
    b, v, h, w, c = features.shape
    vol_shape = coord_volumes.shape[1:4]
    n = int(np.prod(vol_shape))
    grid = coord_volumes.reshape(b, n, 3)

    hom = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)  # (B,N,4)
    uvw = jnp.einsum("bvij,bnj->bvni", proj_matrices, hom)                # (B,V,N,3)
    depth = uvw[..., 2]
    invalid = depth <= 0.0
    safe_depth = jnp.where(depth == 0.0, 1.0, depth)
    uv = uvw[..., :2] / safe_depth[..., None]                             # (B,V,N,2)

    # reference normalisation: g = 2*(u/shape0 - 0.5); grid_sample with
    # align_corners=True then samples pixel (g+1)/2*(dim-1) = u*(dim-1)/shape0
    px = uv[..., 0] * (w - 1) / h
    py = uv[..., 1] * (h - 1) / w
    coords = jnp.stack([px, py], axis=-1)

    samples = bilinear_sample_nhwc(features, coords)                      # (B,V,N,C)
    samples = samples * (~invalid[..., None]).astype(samples.dtype)

    if aggregation == "sum":
        vol = jnp.sum(samples, axis=1)
    elif aggregation == "max":
        vol = jnp.max(samples, axis=1)
    elif aggregation == "softmax":
        weights = jax.nn.softmax(samples.astype(jnp.float32), axis=1)
        vol = jnp.sum(weights * samples.astype(jnp.float32), axis=1)
    elif aggregation.startswith("conf"):
        if vol_confidences is None:
            raise ValueError("conf aggregation needs vol_confidences")
        vol = jnp.sum(samples * vol_confidences[:, :, None, :], axis=1)
    else:
        raise ValueError(f"unknown aggregation {aggregation!r}")

    return vol.reshape(b, *vol_shape, c)


def integrate_volumes_with_coordinates(
    volumes: jax.Array, coord_volumes: jax.Array, softmax: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """3D soft-argmax over per-joint volumes (reference op.py:84-96).

    volumes: (B, X, Y, Z, K); coord_volumes: (B, X, Y, Z, 3).
    Returns (coords (B, K, 3), probs (B, X, Y, Z, K)).
    """
    b, x, y, z, k = volumes.shape
    flat = volumes.reshape(b, -1, k).astype(jnp.float32)
    if softmax:
        flat = jax.nn.softmax(flat, axis=1)
    else:
        flat = jax.nn.relu(flat)
        flat = flat / jnp.maximum(jnp.sum(flat, axis=1, keepdims=True), 1e-12)
    coords = jnp.einsum(
        "bnk,bnc->bkc", flat, coord_volumes.reshape(b, -1, 3),
        precision=jax.lax.Precision.HIGHEST,
    )
    return coords, flat.reshape(b, x, y, z, k)
