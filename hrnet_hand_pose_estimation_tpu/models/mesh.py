"""Graph-CNN hand mesh/shape networks (minimal, capability-parity tier).

Re-design of the reference's mesh/shape family (lib/models/
net_hm_feat_mesh.py:211, net_mesh_pose.py:22, shape_pose_network.py:28 —
VEST upstream: no config or tool wires them).  Provided so the capability
exists end-to-end: image features + 2D heatmaps -> per-vertex mesh offsets
via dense Chebyshev graph convolutions over a coarsened hand-mesh graph
(utils/graph.py), plus a pose head — the architecture of "3D Hand Shape
and Pose Estimation" distilled to its TPU-friendly core (dense small-graph
matmuls on the MXU instead of sparse gathers).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class ChebConv(nn.Module):
    """Dense Chebyshev graph convolution: y = sum_k T_k(L) x W_k."""

    features: int
    basis: np.ndarray  # (K, N, N) from utils.graph.chebyshev_basis

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kb = jnp.asarray(self.basis)
        k = kb.shape[0]
        w = self.param("w", nn.initializers.lecun_normal(),
                       (k, x.shape[-1], self.features))
        y = jnp.einsum("knm,bmc,kco->bno", kb, x.astype(jnp.float32), w,
                       precision=jax.lax.Precision.HIGHEST)
        b = self.param("b", nn.initializers.zeros, (self.features,))
        return y + b


class HandMeshNet(nn.Module):
    """Features -> graph-CNN mesh vertices + 3D pose head."""

    basis: np.ndarray             # Chebyshev basis of the mesh graph
    n_vertices: int
    num_joints: int = 21
    widths: Sequence[int] = (64, 32)

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False):
        """features: (B, H, W, C) backbone features -> (mesh (B, V, 3),
        pose3d (B, K, 3))."""
        g = jnp.mean(features.astype(jnp.float32), axis=(1, 2))   # (B, C)
        init = nn.Dense(self.n_vertices * self.widths[0], name="lift")(g)
        x = init.reshape(-1, self.n_vertices, self.widths[0])
        for i, wdt in enumerate(self.widths):
            x = nn.relu(ChebConv(wdt, self.basis, name=f"cheb{i}")(x))
        mesh = ChebConv(3, self.basis, name="out")(x)             # (B, V, 3)
        pose = nn.Dense(self.num_joints * 3, name="pose_head")(g)
        return mesh, pose.reshape(-1, self.num_joints, 3)


def hand_edges() -> np.ndarray:
    """Bone-graph edges of the 21-joint hand (kinematic chain) — the default
    graph when no dense MANO mesh is supplied."""
    from ..data.legends import BONE_CHILDREN, BONE_PARENTS

    return np.stack([BONE_PARENTS, BONE_CHILDREN], axis=1).astype(np.int64)


def build_hand_mesh_net(num_joints: int = 21, cheb_k: int = 3) -> HandMeshNet:
    from ..utils.graph import adjacency_from_edges, chebyshev_basis, rescaled_laplacian

    adj = adjacency_from_edges(num_joints, hand_edges())
    basis = chebyshev_basis(rescaled_laplacian(adj), cheb_k)
    return HandMeshNet(basis=basis, n_vertices=num_joints, num_joints=num_joints)
