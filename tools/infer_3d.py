"""Multi-view 3D inference demo.

Equivalent of reference tools/infer_3D.py:105-359: run a triangulation net
over multi-view samples, render per-view 2D overlays + the recovered 3D
skeleton to image files.

    python tools/infer_3d.py --cfg <exp.yaml> --model_path <ckpt> --out_dir /tmp/out3d
"""

from __future__ import annotations

import os

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--out_dir", default="inference3d_out")
    p.add_argument("--num_samples", type=int, default=2)
    args = p.parse_args()
    setup_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hrnet_hand_pose_estimation_tpu.core.evaluator3d import Evaluator3D
    from hrnet_hand_pose_estimation_tpu.data.build import make_test_dataloader
    from hrnet_hand_pose_estimation_tpu.data.legends import BONE_CHILDREN, BONE_PARENTS
    from hrnet_hand_pose_estimation_tpu.data.transforms import denormalize_image
    from hrnet_hand_pose_estimation_tpu.models.triangulation import build_triangulation_net
    from hrnet_hand_pose_estimation_tpu.ops.geometry import compose_projection
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained

    cfg = load_cfg(args)
    model = build_triangulation_net(cfg)
    loaders = make_test_dataloader(cfg)
    name, loader = next(iter(loaders.items()))
    batch = next(iter(loader))

    if args.model_path:
        variables = load_pretrained(args.model_path)
    else:
        images = jnp.asarray(batch["imgs"][:1])
        proj = compose_projection(
            jnp.asarray(batch["intrinsic_matrix"][:1])[:, None],
            jnp.asarray(batch["extrinsic_matrices"][:1]))
        variables = model.init(
            {"params": jax.random.key(0), "aug": jax.random.key(1)}, images, proj, False)

    ev = Evaluator3D(cfg, model, variables, mode="model")
    orig_size = tuple(getattr(loader.dataset, "orig_img_size", (640, 480)))
    proj = ev._projections(batch, orig_size)
    kp2d, kp3d = ev.forward(variables, jnp.asarray(batch["imgs"]), proj)
    kp2d, kp3d = np.asarray(kp2d), np.asarray(kp3d)

    os.makedirs(args.out_dir, exist_ok=True)
    import cv2

    hm = float(cfg.MODEL.HEATMAP_SIZE[0])
    size = int(cfg.MODEL.IMAGE_SIZE[0])
    n = min(args.num_samples, kp2d.shape[0])
    for b in range(n):
        panels = []
        for v in range(kp2d.shape[1]):
            img = denormalize_image(np.asarray(batch["imgs"][b, v]))
            img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR).copy()
            pts = kp2d[b, v]
            # vol keeps heatmap coords; scale into the input image
            if "vol" in str(cfg.MODEL.TRIANGULATION_MODEL_NAME):
                pts = pts * (size / hm)
            else:
                ow, oh = orig_size
                pts = pts * np.asarray([size / ow, size / oh])
            for p_, c_ in zip(BONE_PARENTS, BONE_CHILDREN):
                cv2.line(img, tuple(pts[p_].astype(int)), tuple(pts[c_].astype(int)),
                         (0, 255, 0), 1)
            panels.append(img)
        canvas = np.concatenate(panels, axis=1)
        out = os.path.join(args.out_dir, f"sample{b}_views.png")
        cv2.imwrite(out, canvas)
        np.savetxt(os.path.join(args.out_dir, f"sample{b}_pose3d.txt"), kp3d[b])
        err = np.linalg.norm(kp3d[b] - np.asarray(batch["pose3d"][b]), axis=1)
        print(f"sample {b}: wrote {out}; 3D EPE {err.mean():.2f} mm")


if __name__ == "__main__":
    main()
