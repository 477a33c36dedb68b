"""3D multi-view evaluation: 2D px + 3D mm EPE/PCK/AUC with artifacts.

Re-design of reference tools/evaluate_3D.py:143-420:
- three paths: plain 2D backbone + per-joint DLT (:293-303), alg/ransac
  in-model (:310-319), volumetric with K rescale (:324-360)
- accumulates 2D EPE/PCK (px, thresholds 1..49) and 3D EPE/PCK
  (mm, thresholds 1..50) + AUC
- artifacts ``eval3D_results_<EXP>/{mse2d,mse3d}_each_joint.txt`` +
  ``PCK{2,3}d.txt`` matching the reference's formats
- ``--views`` subset selection is supported by slicing the view axis
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.decode import decode_heatmaps
from ..ops.geometry import compose_projection, triangulate_batch, update_after_resize
from .metrics import (
    PoseMetricState,
    default_thresholds_2d,
    default_thresholds_3d,
    pck_at,
    pck_auc,
)


class Evaluator3D:
    def __init__(self, cfg, model, variables, mode: str = "model", mesh=None):
        """mode: 'model' (alg/ransac/vol nets) or 'dlt' (2D backbone + DLT)."""
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.mode = mode
        self.mesh = mesh
        self.kind = str(cfg.MODEL.TRIANGULATION_MODEL_NAME)
        self.th2d = default_thresholds_2d()
        self.th3d = default_thresholds_3d()
        use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)
        hm = int(cfg.MODEL.HEATMAP_SIZE[0])

        if mode == "dlt":
            def forward(variables, images, proj):
                b, v = images.shape[:2]
                flat = images.reshape(-1, *images.shape[2:])
                out = model.apply(variables, flat, False)
                kp2d = decode_heatmaps(out.heatmaps, use_softmax)
                kp2d = kp2d.reshape(b, v, -1, 2)
                return kp2d, None
        else:
            def forward(variables, images, proj):
                out = model.apply(variables, images, proj, False)
                return out.keypoints_2d, out.keypoints_3d

        if mesh is None:
            self.forward = jax.jit(forward)
            self._put = lambda x: jnp.asarray(x)
        else:
            # data-parallel multi-view eval over the mesh: batch axis 0 of
            # both (B,V,H,W,3) images and (B,V,3,4) projections shards over
            # 'data'; variables follow param_shardings (TP-aware)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import param_shardings

            var_sh = param_shardings(mesh, variables)
            self.variables = jax.device_put(variables, var_sh)

            def data_sh(x):
                return NamedSharding(mesh, P(*(["data"] + [None] * (x.ndim - 1))))

            # jit lazily: in_shardings need the concrete batch ranks
            self._jit_cache = {}
            base_forward = forward

            def sharded_forward(variables, images, proj):
                if "fn" not in self._jit_cache:
                    self._jit_cache["fn"] = jax.jit(
                        base_forward,
                        in_shardings=(var_sh, data_sh(images), data_sh(proj)))
                return self._jit_cache["fn"](variables, images, proj)

            self.forward = sharded_forward
            self._put = lambda x: jax.device_put(np.asarray(x), data_sh(np.asarray(x)))

    def _projections(self, batch, orig_size):
        K = jnp.asarray(batch["intrinsic_matrix"])
        E = jnp.asarray(batch["extrinsic_matrices"])
        hm = int(self.cfg.MODEL.HEATMAP_SIZE[0])
        if self.mode == "model" and "vol" in self.kind:
            K = update_after_resize(K, (orig_size[1], orig_size[0]), (hm, hm))
        return compose_projection(K[:, None], E)

    def run(self, loader, views: Optional[Sequence[int]] = None,
            output_dir: Optional[str] = None) -> Dict[str, float]:
        cfg = self.cfg
        hm = float(cfg.MODEL.HEATMAP_SIZE[0])
        n_joints = int(cfg.DATASET.NUM_JOINTS)
        orig_size = tuple(getattr(loader.dataset, "orig_img_size", (640, 480)))
        ow, oh = orig_size
        m2d = PoseMetricState.create(n_joints, self.th2d)
        m3d = PoseMetricState.create(n_joints, self.th3d)

        for batch in loader:
            images = self._put(batch["imgs"])
            if views is not None:
                sel = np.asarray(views)
                images = images[:, sel]
                batch = dict(batch)
                batch["extrinsic_matrices"] = batch["extrinsic_matrices"][:, sel]
                batch["pose2d"] = batch["pose2d"][:, sel]
                batch["visibility"] = batch["visibility"][:, sel]
            proj = self._projections(batch, orig_size)
            kp2d, kp3d = self.forward(self.variables, images, proj)
            kp2d = np.asarray(kp2d)
            b, v = kp2d.shape[:2]

            scale = np.asarray([ow / hm, oh / hm], np.float32)
            if self.mode == "dlt":
                kp2d_full = kp2d * scale
                kp3d = triangulate_batch(jnp.asarray(kp2d_full), proj, method="sii")
            elif "vol" in self.kind:
                kp2d_full = kp2d * scale   # vol keeps heatmap coords (:324-360)
            else:
                kp2d_full = kp2d           # alg/ransac already at original scale

            gt2d = np.asarray(batch["pose2d"], np.float32) * scale
            vis = np.asarray(batch["visibility"], np.float32)
            vis = vis[..., 0] if vis.ndim == 4 else vis
            m2d = m2d.update(
                jnp.asarray(kp2d_full.reshape(b * v, -1, 2)),
                jnp.asarray(gt2d.reshape(b * v, -1, 2)),
                jnp.asarray(vis.reshape(b * v, -1)), self.th2d)
            m3d = m3d.update(
                jnp.asarray(kp3d), jnp.asarray(batch["pose3d"]),
                jnp.ones((b, n_joints)), self.th3d)

        pck2d, pck3d = m2d.pck_curve(), m3d.pck_curve()
        results = {
            "EPE2D_px": m2d.epe_mean(),
            "EPE3D_mm": m3d.epe_mean(),
            "PCK3D_AUC": pck_auc(pck3d, np.asarray(self.th3d), end=None),
            "PCK3D@20mm": pck_at(pck3d, np.asarray(self.th3d), 20.0),
            "PCK2D_AUC_30": pck_auc(pck2d, np.asarray(self.th2d)),
        }
        if output_dir:
            d = os.path.join(output_dir, f"eval3D_results_{cfg.EXP_NAME}")
            os.makedirs(d, exist_ok=True)
            np.savetxt(os.path.join(d, "mse2d_each_joint.txt"), m2d.epe_per_joint(), fmt="%.4f")
            np.savetxt(os.path.join(d, "mse3d_each_joint.txt"), m3d.epe_per_joint(), fmt="%.4f")
            np.savetxt(os.path.join(d, "PCK2d.txt"), np.stack((np.asarray(self.th2d), pck2d)))
            np.savetxt(os.path.join(d, "PCK3d.txt"), np.stack((np.asarray(self.th3d), pck3d)))
        return results
