"""Loss suite — functional, fully vectorised equivalents of reference
lib/core/loss.py:15-256.

Every loss is a pure ``f(pred, target, ...) -> scalar`` jnp function that can
sit inside the jitted SPMD train step; none of the reference's per-sample /
per-finger python loops survive (they become batched gathers and einsums).
Reductions replicate the reference semantics exactly, including its
unconventional normalisations (e.g. JointsMSELoss dividing by num_joints
rather than batch*num_joints when visibility is absent, loss.py:50).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.legends import BONE_PARENTS_REF, KC_MATRIX


def heatmap_loss(pred: jax.Array, gt: jax.Array, mode: str = "l2") -> jax.Array:
    """HeatmapLoss (reference loss.py:15-28): per-pixel L2/L1, summed over the
    spatial plane, averaged over batch*joints.

    pred/gt: (B, H, W, K).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if mode == "l2":
        err = (pred - gt) ** 2
    elif mode == "l1":
        err = jnp.abs(pred - gt)
    else:
        raise ValueError(f"unknown heatmap loss mode {mode!r}")
    # reference sums over the last two dims of (B, K, H, W) then means; with
    # NHWK that is a sum over H, W and a mean over B, K.
    return jnp.mean(jnp.sum(err, axis=(1, 2)))


def joints_mse_loss(
    pose_pred: jax.Array, pose_gt: jax.Array, visibility: Optional[jax.Array] = None
) -> jax.Array:
    """JointsMSELoss (reference loss.py:30-50): mean Euclidean norm.

    pose_pred/gt: (B, K, D); visibility: (B, K) or None.
    """
    d = jnp.linalg.norm(pose_pred.astype(jnp.float32) - pose_gt.astype(jnp.float32), axis=2)
    if visibility is not None:
        vis = visibility.astype(jnp.float32)
        return jnp.sum(d * vis) / jnp.maximum(1.0, jnp.sum(vis))
    return jnp.sum(d) / pose_pred.shape[1]


def joints_mse_smooth_loss(
    pose_pred: jax.Array, pose_gt: jax.Array,
    visibility: Optional[jax.Array] = None, threshold: float = 400.0,
) -> jax.Array:
    """JointsMSESmoothLoss (reference loss.py:52-69): squared error with a
    soft cap ``d^0.1 * threshold^0.9`` above the threshold."""
    diff = (pose_gt.astype(jnp.float32) - pose_pred.astype(jnp.float32)) ** 2
    if visibility is not None:
        diff = diff * visibility[..., None].astype(jnp.float32)
    capped = jnp.where(diff > threshold, jnp.power(diff, 0.1) * threshold**0.9, diff)
    if visibility is not None:
        return jnp.sum(capped) / jnp.maximum(1.0, jnp.sum(visibility))
    return jnp.sum(capped) / pose_gt.shape[1]


def joints_mae_loss(
    pose_pred: jax.Array, pose_gt: jax.Array, visibility: Optional[jax.Array] = None
) -> jax.Array:
    """JointsMAELoss (reference loss.py:71-91)."""
    err = jnp.abs(pose_gt.astype(jnp.float32) - pose_pred.astype(jnp.float32))
    if visibility is not None:
        vis = visibility.astype(jnp.float32)
        if vis.ndim == err.ndim - 1:
            vis = vis[..., None]
        return jnp.sum(err * vis) / jnp.maximum(1.0, jnp.sum(vis))
    return jnp.sum(err) / pose_gt.shape[1]


def joints_ohkm_mse_loss(
    output: jax.Array, target: jax.Array,
    target_weight: Optional[jax.Array] = None, topk: int = 8,
) -> jax.Array:
    """Online hard keypoint mining MSE (reference loss.py:93-135).

    output/target: (B, H, W, K) heatmaps; target_weight: (B, K) or (B, K, 1).
    Per-joint 0.5*MSE over the flattened plane, then mean of the top-k joint
    losses per sample.
    """
    b, h, w, k = output.shape
    pred = output.astype(jnp.float32).reshape(b, h * w, k)
    gt = target.astype(jnp.float32).reshape(b, h * w, k)
    if target_weight is not None:
        tw = target_weight.reshape(b, 1, k).astype(jnp.float32)
        pred = pred * tw
        gt = gt * tw
    per_joint = 0.5 * jnp.mean((pred - gt) ** 2, axis=1)  # (B, K)
    topv, _ = jax.lax.top_k(per_joint, topk)
    return jnp.mean(jnp.sum(topv, axis=1) / topk)


def joints_3d_mse_loss(pose3d_pred: jax.Array, pose3d_gt: jax.Array) -> jax.Array:
    """Joints3DMSELoss (reference loss.py:137-148): sum of joint norms / K."""
    d = jnp.linalg.norm(pose3d_gt.astype(jnp.float32) - pose3d_pred.astype(jnp.float32), axis=2)
    return jnp.sum(d) / pose3d_pred.shape[1]


def bone_length_loss(pose_pred: jax.Array, pose_gt: jax.Array) -> jax.Array:
    """BoneLengthLoss (reference loss.py:150-177), batched.

    The reference traverses 20 bones between *consecutive* joint indices (its
    wrist branch is unreachable; see data/legends.py BONE_PARENTS_REF) and
    returns sum over batch and bones of squared length error, divided by 20.
    """
    parents = jnp.asarray(BONE_PARENTS_REF)
    children = parents + 1
    def lengths(p):
        v = p[:, children, :] - p[:, parents, :]
        return jnp.linalg.norm(v.astype(jnp.float32), axis=2)
    return jnp.sum((lengths(pose_gt) - lengths(pose_pred)) ** 2) / 20.0


# finger chain joint indices for the angle loss: finger f has joints
# [4f, 4f+1, 4f+2, 4f+3, 4f+4] in the traversal order of reference loss.py:198-201
_FINGER_BASE = np.arange(5) * 4


def joint_angle_loss(pose_pred: jax.Array) -> jax.Array:
    """JointAngleLoss (reference loss.py:179-223), batched over (B, fingers).

    Two terms per finger: (1) coplanarity of the four finger bones when the
    input is 3D, via scalar triple products; (2) consistency of consecutive
    rotation directions, penalising negative dot products quadratically.
    2D inputs are lifted with z=0, which reproduces the reference's cross
    products of 2D bones (their z component).
    """
    p = pose_pred.astype(jnp.float32)
    is3d = p.shape[2] == 3
    if not is3d:
        p = jnp.concatenate([p, jnp.zeros_like(p[..., :1])], axis=-1)

    base = jnp.asarray(_FINGER_BASE)
    # joints (B, 5, 5, 3): wrist-indexed chains [4f, 4f+1 .. 4f+4]
    idx = base[:, None] + jnp.arange(5)[None, :]
    chain = p[:, idx, :]                                  # (B, 5, 5, 3)
    bones = chain[:, :, 1:, :] - chain[:, :, :-1, :]      # (B, 5, 4, 3) = bone1..bone4

    b1, b2, b3, b4 = (bones[:, :, i, :] for i in range(4))
    rot_tip = jnp.cross(b4, b3)
    rot_mid = jnp.cross(b3, b2)
    rot_palm = jnp.cross(b2, b1)

    loss = jnp.zeros((), jnp.float32)
    if is3d:
        coplane = jnp.sum(rot_palm * b4, axis=-1) + jnp.sum(rot_mid * b4, axis=-1)
        loss = loss + jnp.sum(coplane)

    d1 = jnp.sum(rot_tip * rot_mid, axis=-1)
    d2 = jnp.sum(rot_palm * rot_mid, axis=-1)
    loss = loss + jnp.sum(jnp.where(d1 < 0, d1**2, 0.0))
    loss = loss + jnp.sum(jnp.where(d2 < 0, d2**2, 0.0))
    return loss


def volumetric_ce_loss(
    coord_volumes: jax.Array, volumes_pred: jax.Array,
    keypoints_gt: jax.Array, validity: jax.Array,
) -> jax.Array:
    """VolumetricCELoss (reference loss.py:225-256), loop-free.

    coord_volumes: (B, X, Y, Z, 3) world coords of voxel centres
    volumes_pred:  (B, X, Y, Z, K) per-joint probability volumes
    keypoints_gt:  (B, K, 3); validity: (B, K) or (B, K, 1)

    For each joint, take -log(prob) of the voxel whose centre is nearest the
    GT keypoint.  The nearest-voxel argmin is computed per joint with one
    reduction over the flattened volume.
    """
    b, x, y, z, k = volumes_pred.shape
    cv = coord_volumes.reshape(b, -1, 3).astype(jnp.float32)        # (B, V, 3)
    kp = keypoints_gt.astype(jnp.float32)                           # (B, K, 3)
    # squared distances (B, V, K) via ||c||^2 - 2 c.k + ||k||^2 (MXU einsum)
    d = (
        jnp.sum(cv**2, axis=-1)[:, :, None]
        - 2.0 * jnp.einsum("bvc,bkc->bvk", cv, kp)
        + jnp.sum(kp**2, axis=-1)[:, None, :]
    )
    nearest = jnp.argmin(d, axis=1)                                 # (B, K)
    vols = volumes_pred.reshape(b, -1, k).astype(jnp.float32)
    probs = jnp.take_along_axis(vols, nearest[:, None, :], axis=1)[:, 0, :]  # (B, K)
    val = validity.reshape(b, k).astype(jnp.float32)
    return jnp.sum(val * (-jnp.log(probs + 1e-6))) / (b * k)


def kcs_loss(pose3d_pred: jax.Array, pose3d_gt: jax.Array) -> jax.Array:
    """Kinematic-chain-space Gram-matrix loss (reference function3D.py:159-189):
    MSE between Gram matrices of KC_matrix @ pose3d."""
    kc = jnp.asarray(KC_MATRIX)
    def gram(p):
        bones = jnp.einsum("jk,bkc->bjc", kc, p.astype(jnp.float32))
        return jnp.einsum("bjc,bkc->bjk", bones, bones)
    return jnp.mean((gram(pose3d_pred) - gram(pose3d_gt)) ** 2)


def scale_pose(pose: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Wrist-centred, middle-finger-normalised pose (reference
    lib/utils/transforms.py:124-175 scale_pose2d/scale_pose3d).

    pose: (B, K, D) with D in {2, 3}; joint 0 = wrist, joint 9 = middle palm.
    """
    rel = pose.astype(jnp.float32) - pose[:, 0:1, :].astype(jnp.float32)
    ref_len = jnp.linalg.norm(rel[:, 9, :] - rel[:, 0, :], axis=1)
    return rel / jnp.maximum(ref_len, eps)[:, None, None]
