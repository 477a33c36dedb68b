"""Linear-blend-skinning hand model (MANO-style), pure jnp.

Re-design of the reference's vendored numpy/chumpy MANO stack
(lib/dataset/frei_utils/mano_loader.py:62 load_model, lbs.py:31 rigid
transform chain, verts.py LBS): shape blendshapes, pose blendshapes,
joint regression, a forward-kinematic rigid chain, and linear blend
skinning — all batched, differentiable and jit-compatible (the chumpy
autodiff graph is replaced by JAX itself).

The published MANO asset (MANO_RIGHT.pkl) cannot ship here; ``load_mano``
reads it when present, and ``toy_hand_model`` builds a small synthetic rig
with the same structure so the layer is testable end-to-end.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class HandModel(NamedTuple):
    v_template: jax.Array    # (V, 3) rest vertices
    shapedirs: jax.Array     # (V, 3, n_shape)
    posedirs: jax.Array      # (V, 3, (J-1)*9)
    j_regressor: jax.Array   # (J, V)
    weights: jax.Array       # (V, J) skinning weights
    parents: jax.Array       # (J,) kinematic parents, -1 for root
    faces: Optional[np.ndarray] = None


def rodrigues(rvecs: jax.Array) -> jax.Array:
    """Batched axis-angle -> rotation matrices. rvecs (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(rvecs, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-8)
    axis = rvecs / theta
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    k = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    return eye + jnp.sin(t) * k + (1.0 - jnp.cos(t)) * (k @ k)


def lbs(model: HandModel, pose: jax.Array, betas: jax.Array,
        global_transl: Optional[jax.Array] = None):
    """Pose + shape -> (vertices (B, V, 3), joints (B, J, 3)).

    pose: (B, J, 3) axis-angle per joint (joint 0 = global orientation);
    betas: (B, n_shape) shape coefficients.
    Mirrors the reference LBS pipeline (frei_utils/verts.py):
    shape blendshapes -> joint regression -> pose blendshapes ->
    forward kinematics -> skinning.
    """
    b = pose.shape[0]
    n_j = model.parents.shape[0]

    v_shaped = model.v_template + jnp.einsum("vcs,bs->bvc", model.shapedirs, betas)
    joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)

    rots = rodrigues(pose)                                      # (B, J, 3, 3)
    # pose blendshapes from non-root rotations minus identity
    pose_feat = (rots[:, 1:] - jnp.eye(3)).reshape(b, -1)
    v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", model.posedirs, pose_feat)

    # forward kinematics: world transform per joint
    parents = np.asarray(model.parents)

    transforms = [None] * n_j
    for j in range(n_j):
        rel_t = jnp.concatenate([
            jnp.concatenate([rots[:, j], (joints[:, j] if parents[j] < 0 else
                                          joints[:, j] - joints[:, parents[j]])[..., None]], -1),
            jnp.broadcast_to(jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]]), (b, 1, 4)),
        ], axis=1)                                              # (B, 4, 4)
        if parents[j] < 0:
            transforms[j] = rel_t
        else:
            transforms[j] = transforms[parents[j]] @ rel_t
    world = jnp.stack(transforms, axis=1)                       # (B, J, 4, 4)

    posed_joints = world[..., :3, 3]
    # remove the rest-pose joint location (standard LBS correction)
    correction = jnp.einsum("bjmn,bjn->bjm", world[..., :3, :3], joints)
    skin_t = world.at[..., :3, 3].add(-correction)

    vert_t = jnp.einsum("vj,bjmn->bvmn", model.weights, skin_t)  # (B, V, 4, 4)
    hom = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], -1)
    verts = jnp.einsum("bvmn,bvn->bvm", vert_t, hom)[..., :3]

    if global_transl is not None:
        verts = verts + global_transl[:, None]
        posed_joints = posed_joints + global_transl[:, None]
    return verts, posed_joints


def load_mano(path: str) -> HandModel:
    """Read a MANO pickle (chumpy arrays coerced to numpy) when available."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def arr(x):
        return np.asarray(x, dtype=np.float64).astype(np.float32)

    kintree = np.asarray(data["kintree_table"])[0]
    parents = np.where(kintree > 1_000_000, -1, kintree).astype(np.int32)
    return HandModel(
        v_template=jnp.asarray(arr(data["v_template"])),
        shapedirs=jnp.asarray(arr(data["shapedirs"])),
        posedirs=jnp.asarray(arr(data["posedirs"]).reshape(
            len(data["v_template"]), 3, -1)),
        j_regressor=jnp.asarray(arr(
            data["J_regressor"].toarray() if hasattr(data["J_regressor"], "toarray")
            else data["J_regressor"])),
        weights=jnp.asarray(arr(data["weights"])),
        parents=jnp.asarray(parents),
        faces=np.asarray(data["f"]) if "f" in data else None,
    )


def toy_hand_model(n_verts: int = 40, n_joints: int = 5, n_shape: int = 3,
                   seed: int = 0) -> HandModel:
    """Small synthetic rig with MANO structure for tests/examples: a chain of
    joints along +x with vertices clustered around them."""
    rng = np.random.default_rng(seed)
    joints_rest = np.stack([np.arange(n_joints, dtype=np.float32),
                            np.zeros(n_joints), np.zeros(n_joints)], -1)
    owner = rng.integers(0, n_joints, size=n_verts)
    verts = joints_rest[owner] + rng.normal(scale=0.2, size=(n_verts, 3))
    weights = np.zeros((n_verts, n_joints), np.float32)
    weights[np.arange(n_verts), owner] = 1.0
    j_reg = np.zeros((n_joints, n_verts), np.float32)
    for j in range(n_joints):
        mask = owner == j
        if mask.any():
            j_reg[j, mask] = 1.0 / mask.sum()
    return HandModel(
        v_template=jnp.asarray(verts.astype(np.float32)),
        shapedirs=jnp.asarray(rng.normal(scale=0.01,
                                         size=(n_verts, 3, n_shape)).astype(np.float32)),
        posedirs=jnp.asarray(np.zeros((n_verts, 3, (n_joints - 1) * 9), np.float32)),
        j_regressor=jnp.asarray(j_reg),
        weights=jnp.asarray(weights),
        parents=jnp.asarray(np.arange(-1, n_joints - 1, dtype=np.int32)),
    )
