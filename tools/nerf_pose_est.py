"""Hand pose on NeRF/LLFF camera data (experiment).

Equivalent of reference tools/nerf_pose_est.py:27-223 + load_llff.py: read
LLFF ``poses_bounds.npy`` camera parameters, run the 2D model per view, and
triangulate across views with the calibrated projections.

    python tools/nerf_pose_est.py --cfg <exp.yaml> --scene <dir with images/ + poses_bounds.npy>
"""

from __future__ import annotations

import os

from _common import base_parser, load_cfg, setup_platform


def load_llff_poses(scene_dir: str):
    """Parse ``poses_bounds.npy`` (reference load_llff.py): rows are
    3x5 [R|t|hwf] matrices + 2 depth bounds per image.

    Returns (c2w (N, 3, 4), hwf (N, 3), bounds (N, 2)).
    """
    import numpy as np

    arr = np.load(os.path.join(scene_dir, "poses_bounds.npy"))  # (N, 17)
    poses = arr[:, :-2].reshape(-1, 3, 5)
    bounds = arr[:, -2:]
    c2w = poses[:, :, :4]
    hwf = poses[:, :, 4]
    # LLFF axes [down, right, back] -> standard [right, down, forward]
    c2w = np.concatenate(
        [c2w[:, :, 1:2], c2w[:, :, 0:1], -c2w[:, :, 2:3], c2w[:, :, 3:4]], axis=2)
    return c2w.astype(np.float32), hwf.astype(np.float32), bounds.astype(np.float32)


def llff_projections(c2w, hwf):
    """Camera-to-world -> projection matrices P = K [R|t] (world-to-image)."""
    import numpy as np

    n = c2w.shape[0]
    projs = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        h, w, f = hwf[i]
        K = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1]], np.float32)
        R = c2w[i, :, :3].T                     # world->cam rotation
        t = -R @ c2w[i, :, 3]
        projs[i] = K @ np.concatenate([R, t[:, None]], axis=1)
    return projs


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--scene", required=True, help="LLFF scene directory")
    p.add_argument("--out_dir", default="nerf_pose_out")
    args = p.parse_args()
    setup_platform(args.platform)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hrnet_hand_pose_estimation_tpu.data.transforms import normalize_image
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.ops.geometry import triangulate_batch
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained
    from hrnet_hand_pose_estimation_tpu.parallel.train_step import make_forward_fn

    cfg = load_cfg(args)
    model = build_model(cfg)
    size = int(cfg.MODEL.IMAGE_SIZE[0])
    hm = float(cfg.MODEL.HEATMAP_SIZE[0])

    c2w, hwf, _ = load_llff_poses(args.scene)
    projs = llff_projections(c2w, hwf)
    img_dir = os.path.join(args.scene, "images")
    names = sorted(f for f in os.listdir(img_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))[: len(projs)]

    if args.model_path:
        variables = load_pretrained(args.model_path)
    else:
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.key(0), jnp.zeros((1, size, size, 3)), False)
    fwd = make_forward_fn(cfg, model)

    kp2d_views = []
    for i, name in enumerate(names):
        img = cv2.cvtColor(cv2.imread(os.path.join(img_dir, name)), cv2.COLOR_BGR2RGB)
        inp = jnp.asarray(normalize_image(cv2.resize(img, (size, size)))[None])
        _, pose = fwd(variables, inp)
        # heatmap coords -> original image pixels
        h0, w0 = hwf[i][0], hwf[i][1]
        kp2d_views.append(np.asarray(pose)[0] * np.asarray([w0 / hm, h0 / hm]))
    kp2d = np.stack(kp2d_views)                               # (V, K, 2)

    kp3d = np.asarray(triangulate_batch(
        jnp.asarray(kp2d[None]), jnp.asarray(projs[None, : len(kp2d)]),
        method="ransac"))[0]

    os.makedirs(args.out_dir, exist_ok=True)
    np.savetxt(os.path.join(args.out_dir, "pose3d.txt"), kp3d)
    np.savetxt(os.path.join(args.out_dir, "pose2d_per_view.txt"),
               kp2d.reshape(len(kp2d), -1))
    print(f"{len(kp2d)} views -> wrote {args.out_dir}/pose3d.txt")


if __name__ == "__main__":
    main()
