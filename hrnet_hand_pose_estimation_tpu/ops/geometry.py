"""Multi-view geometry: projection, triangulation (DLT/SII/RANSAC), cameras.

TPU-native re-design of the reference's triangulation math:
- lib/utils/misc.py:64-97   (DLT_sii_pytorch: shifted-inverse-iteration DLT)
- lib/utils/misc.py:99-175  (SVD / eig DLT variants)
- lib/utils/misc.py:178-239 (triangulate_ransac)
- lib/models/triangulation_model_utils/multiview.py (Camera, reprojection)
- lib/utils/misc.py:16-27   (update_after_resize)

Everything is batched over (batch, joints) and jit-compiles: the reference's
per-joint python loops and ``torch.eig`` calls become one vmapped linear
algebra pass.  TPU has no general nonsymmetric eig, so the eigenvector of
the smallest eigenvalue of AtA is obtained either via ``jnp.linalg.eigh``
(symmetric, supported) or the reference's own SII iteration (solve-based).
RANSAC enumerates all view pairs deterministically instead of sampling 10
random pairs (C(4,2)=6 < 10, so this strictly dominates the reference's
search while staying shape-static).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- basics
def euclidean_to_homogeneous(points: jax.Array) -> jax.Array:
    """(..., M) -> (..., M+1) by appending ones (reference misc.py:39-46)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def homogeneous_to_euclidean(points: jax.Array, eps: float = 0.0) -> jax.Array:
    """(..., M+1) -> (..., M) dividing by the last coordinate (misc.py:29-36)."""
    w = points[..., -1:]
    if eps:
        w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return points[..., :-1] / w


def project_points(proj: jax.Array, points3d: jax.Array) -> jax.Array:
    """Project world points through P = K[R|t].

    proj: (..., 3, 4); points3d: (..., N, 3) -> (..., N, 2).
    """
    hom = euclidean_to_homogeneous(points3d)
    img = jnp.einsum("...ij,...nj->...ni", proj, hom)
    return homogeneous_to_euclidean(img, eps=1e-12)


def update_after_resize(K: jax.Array, image_shape: Tuple[int, int],
                        new_image_shape: Tuple[int, int]) -> jax.Array:
    """Rescale intrinsics for a resized image (reference misc.py:16-27).

    K: (..., 3, 3); shapes are (height, width).
    """
    h, w = image_shape
    nh, nw = new_image_shape
    sx, sy = nw / w, nh / h
    scale = jnp.asarray([[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], K.dtype)
    return K * scale


def compose_projection(K: jax.Array, extrinsics: jax.Array) -> jax.Array:
    """P = K @ [R|t].  K: (..., 3, 3), extrinsics: (..., 3, 4) -> (..., 3, 4)."""
    return jnp.einsum("...ij,...jk->...ik", K, extrinsics)


# ------------------------------------------------------------- DLT core
def _dlt_system(points2d: jax.Array, projs: jax.Array) -> jax.Array:
    """Assemble the (2V, 4) DLT system per point (reference misc.py:78-79).

    points2d: (..., V, 2); projs: (..., V, 3, 4) -> A: (..., 2V, 4).
    """
    a = projs[..., 2:3, :] * points2d[..., :, None]  # (..., V, 2, 4)
    a = a - projs[..., :2, :]
    return a.reshape(*a.shape[:-3], -1, 4)


def triangulate_eigh(points2d: jax.Array, projs: jax.Array,
                     weights: Optional[jax.Array] = None) -> jax.Array:
    """DLT via symmetric eigendecomposition of AtA.

    points2d: (..., V, 2); projs: (..., V, 3, 4); optional per-view
    confidence weights (..., V) (reference triangulation.py:253-264 uses
    confidence-weighted rows).  Returns (..., 3).
    """
    a = _dlt_system(points2d, projs)
    if weights is not None:
        w = jnp.repeat(weights, 2, axis=-1)[..., None]
        a = a * w
    ata = jnp.einsum("...ij,...ik->...jk", a, a,
                     precision=jax.lax.Precision.HIGHEST)
    # unit-trace scaling: keeps f32 eigh well-conditioned at mm/px scales
    # (preserves eigenvectors exactly)
    tr = jnp.trace(ata, axis1=-2, axis2=-1)[..., None, None]
    _, vecs = jnp.linalg.eigh(ata / jnp.maximum(tr, 1e-30))
    x = vecs[..., :, 0]                     # smallest eigenvalue's vector
    # bounded divide: degenerate systems (e.g. untrained models decoding all
    # views to the principal point) otherwise emit coords ~1e11 whose
    # downstream squares overflow f32 into NaN
    return homogeneous_to_euclidean(x, eps=1e-6)


def triangulate_sii(points2d: jax.Array, projs: jax.Array,
                    n_iters: int = 2, shift: float = 0.001,
                    init: Optional[jax.Array] = None) -> jax.Array:
    """Shifted-inverse-iteration DLT, reference-faithful (misc.py:64-97).

    The reference initialises with ``torch.rand``; we default to a fixed
    deterministic vector (counter-based seeds belong to the caller), and the
    iteration ``b <- normalize(solve(AtA + shift*I, b))`` is a fori_loop.
    """
    a = _dlt_system(points2d, projs).astype(jnp.float32)
    ata = jnp.einsum("...ij,...ik->...jk", a, a,
                     precision=jax.lax.Precision.HIGHEST)
    # Scale AtA to unit trace before shifting: at mm/pixel scales AtA reaches
    # ~1e10 and f32 LU of the (numerically singular) raw system NaNs out.
    # Uniform scaling keeps the eigenvectors and the lambda_min/lambda_2 gap
    # that makes inverse iteration converge in the reference's 2 steps; the
    # shift becomes relative (1e-6 of the trace).
    tr = jnp.trace(ata, axis1=-2, axis2=-1)[..., None, None]
    ata = ata / jnp.maximum(tr, 1e-30)
    b_mat = ata + (1e-3 * shift) * jnp.eye(4, dtype=ata.dtype)
    if init is None:
        bk = jnp.full(ata.shape[:-2] + (4,), 0.5, ata.dtype)
    else:
        bk = init
    bk = bk / jnp.linalg.norm(bk, axis=-1, keepdims=True)

    def body(_, bk):
        bk = jnp.linalg.solve(b_mat, bk[..., None])[..., 0]
        return bk / jnp.linalg.norm(bk, axis=-1, keepdims=True)

    bk = jax.lax.fori_loop(0, n_iters, body, bk)
    return homogeneous_to_euclidean(-bk, eps=1e-12)


def triangulate_svd(points2d: jax.Array, projs: jax.Array) -> jax.Array:
    """DLT via SVD (reference misc.py:99-121)."""
    a = _dlt_system(points2d, projs)
    _, _, vh = jnp.linalg.svd(a.astype(jnp.float32), full_matrices=False)
    x = -vh[..., 3, :]
    return homogeneous_to_euclidean(x, eps=1e-12)


def reprojection_errors(point3d: jax.Array, points2d: jax.Array,
                        projs: jax.Array) -> jax.Array:
    """Per-view 2D reprojection error (reference multiview.py:190-200).

    point3d: (..., 3); points2d: (..., V, 2); projs: (..., V, 3, 4)
    -> (..., V).
    """
    hom = euclidean_to_homogeneous(point3d)
    img = jnp.einsum("...vij,...j->...vi", projs, hom)
    uv = homogeneous_to_euclidean(img, eps=1e-12)
    return jnp.linalg.norm(uv - points2d, axis=-1)


def triangulate_ransac(points2d: jax.Array, projs: jax.Array,
                       reproj_eps: float = 40.0) -> Tuple[jax.Array, jax.Array]:
    """RANSAC triangulation over view pairs (reference misc.py:178-239).

    points2d: (..., V, 2); projs: (..., V, 3, 4).
    Deterministically evaluates every C(V,2) hypothesis pair (the reference
    samples 10 random pairs from the same set), picks the hypothesis with the
    most inliers (reprojection error < reproj_eps), and re-triangulates with
    inlier-weighted DLT.  Returns (point3d (..., 3), inlier_mask (..., V)).
    """
    v = points2d.shape[-2]
    pairs = jnp.asarray([(i, j) for i in range(v) for j in range(i + 1, v)])

    def hypothesis(pair):
        idx = pair  # (2,)
        p2 = jnp.take(points2d, idx, axis=-2)
        pr = jnp.take(projs, idx, axis=-3)
        pt3 = triangulate_eigh(p2, pr)
        errs = reprojection_errors(pt3, points2d, projs)
        inliers = errs < reproj_eps
        # hypothesis views always count as inliers (reference misc.py:200)
        inliers = inliers | jnp.any(
            jnp.arange(v)[None, :] == idx[:, None], axis=0
        )
        return inliers, jnp.sum(inliers, axis=-1)

    inlier_sets, counts = jax.vmap(hypothesis)(pairs)  # (P, ..., V), (P, ...)
    best = jnp.argmax(counts, axis=0)                  # (...,)
    best_inliers = jnp.take_along_axis(
        inlier_sets, best[None, ..., None], axis=0
    )[0]                                               # (..., V)
    point3d = triangulate_eigh(points2d, projs, weights=best_inliers.astype(jnp.float32))
    return point3d, best_inliers


def triangulate_batch(points2d: jax.Array, projs: jax.Array,
                      method: str = "eigh",
                      confidences: Optional[jax.Array] = None) -> jax.Array:
    """Triangulate (B, V, K, 2) detections -> (B, K, 3).

    projs: (B, V, 3, 4); confidences: optional (B, V, K).
    """
    b, v, k, _ = points2d.shape
    pts = jnp.swapaxes(points2d, 1, 2)            # (B, K, V, 2)
    prj = jnp.broadcast_to(projs[:, None], (b, k, v, 3, 4))
    w = None if confidences is None else jnp.swapaxes(confidences, 1, 2)
    if method == "eigh":
        return triangulate_eigh(pts, prj, weights=w)
    if method == "sii":
        return triangulate_sii(pts, prj)
    if method == "svd":
        return triangulate_svd(pts, prj)
    if method == "ransac":
        return triangulate_ransac(pts, prj)[0]
    raise ValueError(f"unknown triangulation method {method!r}")
