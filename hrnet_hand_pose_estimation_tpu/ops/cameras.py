"""Camera ops with lens distortion, batched jnp.

Re-design of reference lib/utils/cameras_cuda.py:27-92:
- ``project_point_radial``: pinhole projection with radial (k1..k3) and
  tangential (p1, p2) distortion
- world<->camera rigid transforms

All ops broadcast over leading batch/joint axes and jit cleanly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def world_to_camera_frame(points: jax.Array, R: jax.Array, T: jax.Array) -> jax.Array:
    """x_cam = R (x_world - T).  points (..., N, 3); R (..., 3, 3); T (..., 3)."""
    return jnp.einsum("...ij,...nj->...ni", R, points - T[..., None, :])


def camera_to_world_frame(points: jax.Array, R: jax.Array, T: jax.Array) -> jax.Array:
    return jnp.einsum("...ji,...nj->...ni", R, points) + T[..., None, :]


def project_point_radial(
    points: jax.Array, R: jax.Array, T: jax.Array,
    f: jax.Array, c: jax.Array, k: jax.Array, p: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Project world points with radial+tangential distortion
    (reference cameras_cuda.py:27-56).

    points (..., N, 3); f (..., 2) focal; c (..., 2) principal point;
    k (..., 3) radial coeffs; p (..., 2) tangential coeffs.
    Returns (uv (..., N, 2), depth (..., N)).
    """
    cam = world_to_camera_frame(points, R, T)
    z = cam[..., 2]
    xy = cam[..., :2] / z[..., None]
    r2 = jnp.sum(xy**2, axis=-1)
    radial = 1.0 + k[..., None, 0] * r2 + k[..., None, 1] * r2**2 + k[..., None, 2] * r2**3
    tan = p[..., None, 0] * xy[..., 1] + p[..., None, 1] * xy[..., 0]
    xy_d = xy * (radial + tan)[..., None] + jnp.stack(
        [p[..., None, 1] * r2, p[..., None, 0] * r2], axis=-1)
    uv = xy_d * f[..., None, :] + c[..., None, :]
    return uv, z
