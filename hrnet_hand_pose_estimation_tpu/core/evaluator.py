"""2D evaluation engine: full-test-set EPE / PCK / AUC with artifact output.

Re-design of reference tools/evaluate_2D.py:149-296:
- raw (non-keypoint) eval datasets, batch forward, decode
- rescale heatmap-space predictions back to the original image: RHD uses
  crop_size/hm + corner (:235-239), other datasets orig_size/hm (:240-245)
- visibility-masked per-joint EPE + PCK over thresholds 1..49 px (:268-274)
- artifacts: ``mse2d_each_joint.txt`` + ``PCK2d.txt`` in
  ``eval2D_results_<EXP_NAME>/`` with identical formats (:285-294), so the
  reference's compare.py/--is_vis tooling reads ours unchanged
- wall-clock fps with 20-batch warmup skip (:229-231,:280)
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.decode import decode_heatmaps
from .metrics import PoseMetricState, default_thresholds_2d, pck_at, pck_auc


class Evaluator2D:
    def __init__(self, cfg, model, variables, mesh=None, serving="std",
                 calib_path: str = ""):
        """``serving='int8'`` evaluates the calibrated W8A8 serving path
        (quant trunk + Pallas layer1 chain + stem2) instead of the standard
        forward — the deployment-accuracy check for the quantized model.
        Calibration uses the first eval batch (serving contract:
        calibration data ~ serving data) unless ``calib_path`` names a
        saved record from tools/calibrate.py."""
        if serving not in ("std", "int8"):
            raise ValueError(f"unknown serving mode: {serving!r}")
        if serving == "int8" and not cfg.MODEL.HEATMAP_SOFTMAX:
            # the int8 serving path decodes via the fused softmax
            # soft-argmax head; on a non-softmax config its metrics would
            # measure the decode swap, not quantization
            raise ValueError(
                "serving='int8' requires a softmax-decode config "
                "(MODEL.HEATMAP_SOFTMAX: true)")
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.mesh = mesh
        self.serving = serving
        self.calib_path = calib_path
        self._qfn = None
        self._qparams = None
        use_softmax = bool(cfg.MODEL.HEATMAP_SOFTMAX)

        def forward(variables, images):
            out = model.apply(variables, images, False)
            return out.heatmaps, decode_heatmaps(out.heatmaps, use_softmax)

        if mesh is None:
            self.forward = jax.jit(forward)
            self._put_images = jnp.asarray
        else:
            # data-parallel eval over the mesh (the reference evaluates under
            # DataParallel, tools/evaluate_2D.py:176-231): variables follow
            # param_shardings (TP-aware), batches shard along 'data'
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import param_shardings

            var_sh = param_shardings(mesh, variables)
            self.variables = jax.device_put(variables, var_sh)
            img_sh = NamedSharding(mesh, P("data", None, None, None))
            self.forward = jax.jit(forward, in_shardings=(var_sh, img_sh))
            self._put_images = lambda x: jax.device_put(np.asarray(x), img_sh)
        self.thresholds = default_thresholds_2d()

    def _build_serving(self, calib_images) -> None:
        """Calibrate + build the int8 serving forward on first use (or load
        a saved calibration record when ``calib_path`` was given)."""
        from .quant_infer import (calibrate, load_calibration,
                                  make_quant_infer, prepare_serving_qparams)

        on_cpu = jax.devices()[0].platform == "cpu"
        if self.calib_path:
            amax = load_calibration(self.calib_path, self.cfg)
        else:
            amax = calibrate(self.cfg, self.variables,
                             [np.asarray(calib_images)])
        self._qparams = prepare_serving_qparams(self.cfg, self.variables,
                                                amax)
        self._qfn = make_quant_infer(self.cfg, interpret=on_cpu,
                                     pallas_layer1=not on_cpu,
                                     mesh=self.mesh)

    def run(self, loader, dataset_name: str = "", output_dir: Optional[str] = None
            ) -> Dict[str, float]:
        # dataset_name is informational only (kept for CLI compatibility);
        # rescale dispatch is declared by the reader (``dataset.rescale``)
        cfg = self.cfg
        hm_size = float(cfg.MODEL.HEATMAP_SIZE[0])
        n_joints = int(cfg.DATASET.NUM_JOINTS)
        metrics = PoseMetricState.create(n_joints, self.thresholds)

        # fps warmup: the reference skips the first 20 batches
        # (evaluate_2D.py:229-231); shrink the skip when the loader is
        # shorter so small eval sets still report a (noisier) fps
        try:
            n_batches = len(loader)
        except TypeError:
            n_batches = None
        warmup = 21 if (n_batches is None or n_batches > 30) else \
            max(min(1, n_batches - 1), 0)

        infer_time = [0, 0.0]
        for i, batch in enumerate(loader):
            images = self._put_images(batch["imgs"])
            if self.serving == "int8" and self._qfn is None:
                self._build_serving(batch["imgs"])
            t0 = time.time()
            if self._qfn is not None:
                pose2d_pred = self._qfn(self.variables, self._qparams, images)
            else:
                _, pose2d_pred = self.forward(self.variables, images)
            pose2d_pred = np.asarray(pose2d_pred)
            if i >= warmup:
                infer_time[0] += 1
                infer_time[1] += time.time() - t0

            pose2d_gt = np.asarray(batch["pose2d"], np.float32)
            vis = np.asarray(batch["visibility"], np.float32)
            if vis.ndim == 3:
                vis = vis[..., 0]

            # rescale to original image (reference :235-245); the mode is
            # DECLARED by the reader (``dataset.rescale``), not inferred
            # from batch keys — a non-crop reader that happens to carry a
            # ``corner`` field must still take the orig-size path
            rescale = getattr(getattr(loader, "dataset", None),
                              "rescale", "orig_size")
            if rescale == "crop_corner" and "corner" in batch:
                crop = np.asarray(batch["crop_size"], np.float32).reshape(-1, 1, 1)
                corner = np.asarray(batch["corner"], np.float32)[:, None, :]
                pose2d_pred = pose2d_pred * crop / hm_size + corner
                pose2d_gt = pose2d_gt * crop / hm_size + corner
            else:
                ow, oh = getattr(loader.dataset, "orig_img_size", (hm_size, hm_size))
                pose2d_pred = pose2d_pred * np.asarray([ow / hm_size, oh / hm_size])
                pose2d_gt = pose2d_gt * np.asarray([ow / hm_size, oh / hm_size])

            metrics = metrics.update(
                jnp.asarray(pose2d_pred), jnp.asarray(pose2d_gt), jnp.asarray(vis),
                self.thresholds)

        epe = metrics.epe_per_joint()
        pck = metrics.pck_curve()
        fps = infer_time[0] * loader.batch_size / infer_time[1] if infer_time[1] else 0.0
        th = np.asarray(self.thresholds)
        results = {
            "EPE_px": float(epe.mean()),
            "PCK_AUC_30": pck_auc(pck, th),               # reference plot slice (misc.py:281)
            "PCK_AUC_full": pck_auc(pck, th, end=None),
            "PCK@20px": pck_at(pck, th, 20.0),
            "fps": fps,
        }

        if output_dir:
            result_dir = os.path.join(output_dir, f"eval2D_results_{cfg.EXP_NAME}")
            os.makedirs(result_dir, exist_ok=True)
            np.savetxt(os.path.join(result_dir, "mse2d_each_joint.txt"), epe, fmt="%.4f")
            np.savetxt(os.path.join(result_dir, "PCK2d.txt"), np.stack((th, pck)))
        return results
