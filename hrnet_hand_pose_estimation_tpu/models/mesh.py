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
    """Features -> coarse-to-fine graph-CNN mesh vertices + 3D pose head.

    Mirrors the reference mesh decoder's multi-resolution design
    (net_hm_feat_mesh.py: latent -> coarsest graph -> unpool/ChebConv up the
    coarsening pyramid from lib/utils/coarsening.py), with dense pooling
    matrices instead of the reference's perm+fake-node 1-D maxpool trick —
    on TPU a (N_fine, N_coarse) matmul is the natural unpool and keeps every
    shape static.
    """

    bases: Sequence[np.ndarray]    # Chebyshev basis per level, fine -> coarse
    unpools: Sequence[np.ndarray]  # (N_l, N_{l+1}) unpool from level l+1 to l
    n_vertices: int
    num_joints: int = 21
    widths: Sequence[int] = (64, 32)

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False):
        """features: (B, H, W, C) backbone features -> (mesh (B, V, 3),
        pose3d (B, K, 3))."""
        g = jnp.mean(features.astype(jnp.float32), axis=(1, 2))   # (B, C)
        n_levels = len(self.bases)
        n_coarse = self.bases[-1].shape[1]
        init = nn.Dense(n_coarse * self.widths[0], name="lift")(g)
        x = init.reshape(-1, n_coarse, self.widths[0])
        # decode coarsest -> finest, widening resolution each level
        for lvl in range(n_levels - 1, -1, -1):
            wdt = self.widths[min(n_levels - 1 - lvl, len(self.widths) - 1)]
            x = nn.relu(ChebConv(wdt, self.bases[lvl], name=f"cheb{lvl}")(x))
            if lvl > 0:
                up = jnp.asarray(self.unpools[lvl - 1])
                x = jnp.einsum("nm,bmc->bnc", up, x)
        mesh = ChebConv(3, self.bases[0], name="out")(x)          # (B, V, 3)
        pose = nn.Dense(self.num_joints * 3, name="pose_head")(g)
        return mesh, pose.reshape(-1, self.num_joints, 3)


def hand_edges() -> np.ndarray:
    """Bone-graph edges of the 21-joint hand (kinematic chain) — the default
    graph when no dense MANO mesh is supplied."""
    from ..data.legends import BONE_CHILDREN, BONE_PARENTS

    return np.stack([BONE_PARENTS, BONE_CHILDREN], axis=1).astype(np.int64)


def build_hand_mesh_net(num_joints: int = 21, cheb_k: int = 3,
                        levels: int = 2, edges: np.ndarray | None = None,
                        n_vertices: int | None = None) -> HandMeshNet:
    """Build the coarsening pyramid (utils/graph.py) and the decoder.

    Defaults to the 21-joint bone graph; pass a MANO mesh's edge list +
    vertex count for the dense-mesh variant.
    """
    from ..utils.graph import (
        adjacency_from_edges,
        chebyshev_basis,
        coarsen_levels,
        rescaled_laplacian,
        unpool_matrix,
    )

    n = n_vertices if n_vertices is not None else num_joints
    adj = adjacency_from_edges(n, edges if edges is not None else hand_edges())
    adjs, clusters = coarsen_levels(adj, levels)
    bases = tuple(chebyshev_basis(rescaled_laplacian(a), cheb_k) for a in adjs)
    unpools = tuple(unpool_matrix(cl) for cl in clusters)
    return HandMeshNet(bases=bases, unpools=unpools,
                       n_vertices=n, num_joints=num_joints)
