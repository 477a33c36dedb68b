"""Triangulation sanity check.

Equivalent of reference tools/DLT.py:78-151: project known 3D points through
calibrated cameras (the MHP intrinsics by default, or synthetic ones), then
recover them with each triangulation method and print the errors side by
side — a numerical-parity harness for the geometry stack.

    python tools/dlt_check.py [--views 4] [--noise 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--noise", type=float, default=0.0, help="2D noise std (px)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", ""])
    args = p.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from hrnet_hand_pose_estimation_tpu.data.mhp import INTRINSICS
    from hrnet_hand_pose_estimation_tpu.ops.geometry import triangulate_batch

    rng = np.random.default_rng(0)
    v = args.views
    projs = []
    for i in range(v):
        ang = 2 * np.pi * i / v + 0.3
        c, s = np.cos(ang), np.sin(ang)
        ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        tx = 0.2 + 0.1 * i
        ct, st = np.cos(tx), np.sin(tx)
        rx = np.array([[1, 0, 0], [0, ct, -st], [0, st, ct]], np.float32)
        ext = np.concatenate([rx @ ry, [[0], [0], [600.0]]], axis=1).astype(np.float32)
        projs.append(INTRINSICS @ ext)
    projs = np.stack(projs)

    pose3d = rng.uniform(-80, 80, size=(1, 21, 3)).astype(np.float32)
    hom = np.concatenate([pose3d, np.ones_like(pose3d[..., :1])], -1)
    img = np.einsum("vij,bkj->bvki", projs, hom)
    pose2d = img[..., :2] / img[..., 2:3]
    pose2d += rng.normal(scale=args.noise, size=pose2d.shape)

    print(f"{v} views, noise={args.noise}px")
    print(f"{'method':<8} {'mean err (mm)':>14} {'max err (mm)':>14}")
    for method in ("eigh", "svd", "sii", "ransac"):
        rec = np.asarray(triangulate_batch(
            jnp.asarray(pose2d.astype(np.float32)),
            jnp.broadcast_to(jnp.asarray(projs)[None], (1, v, 3, 4)),
            method=method))
        err = np.linalg.norm(rec - pose3d, axis=2)
        print(f"{method:<8} {err.mean():>14.4f} {err.max():>14.4f}")

    print("\nGT vs recovered (eigh), first 3 joints:")
    rec = np.asarray(triangulate_batch(
        jnp.asarray(pose2d.astype(np.float32)),
        jnp.broadcast_to(jnp.asarray(projs)[None], (1, v, 3, 4)), method="eigh"))
    for k in range(3):
        print(" gt", np.round(pose3d[0, k], 2).tolist(),
              " rec", np.round(rec[0, k], 2).tolist())


if __name__ == "__main__":
    main()
