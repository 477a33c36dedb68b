"""Multi-view 3D evaluation.

Equivalent of reference tools/evaluate_3D.py:143-420: run a triangulation
net (or plain 2D backbone + DLT with --dlt) over the multi-view test set,
accumulate 2D px / 3D mm EPE + PCK + AUC, write eval3D_results artifacts.

    python tools/evaluate_3d.py --cfg <exp.yaml> --model_path <ckpt> --views 0 1 2 3
"""

from __future__ import annotations

import json

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--views", type=int, nargs="*", default=None,
                   help="view subset (reference --views, evaluate_3D.py:228)")
    p.add_argument("--dlt", action="store_true",
                   help="plain 2D backbone + per-joint DLT path (:293-303)")
    p.add_argument("--out", default="tools")
    args = p.parse_args()
    setup_platform(args.platform)

    import jax
    import jax.numpy as jnp

    from hrnet_hand_pose_estimation_tpu.core.evaluator3d import Evaluator3D
    from hrnet_hand_pose_estimation_tpu.data.build import make_test_dataloader
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.models.triangulation import build_triangulation_net
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained

    cfg = load_cfg(args)
    if args.dlt:
        model = build_model(cfg)
        mode = "dlt"
    else:
        model = build_triangulation_net(cfg)
        mode = "model"

    loaders = make_test_dataloader(cfg)
    name, loader = next(iter(loaders.items()))

    if args.model_path:
        variables = load_pretrained(args.model_path)
    else:
        sample = next(iter(loader))
        images = jnp.asarray(sample["imgs"][:1])
        if mode == "dlt":
            variables = jax.jit(model.init, static_argnums=(2,))(
                jax.random.key(0), images.reshape(-1, *images.shape[2:]), False)
        else:
            from hrnet_hand_pose_estimation_tpu.ops.geometry import compose_projection

            proj = compose_projection(
                jnp.asarray(sample["intrinsic_matrix"][:1])[:, None],
                jnp.asarray(sample["extrinsic_matrices"][:1]))
            variables = model.init(
                {"params": jax.random.key(0), "aug": jax.random.key(1)},
                images, proj, False)

    from hrnet_hand_pose_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(tuple(cfg.TPU.MESH_AXES), tuple(cfg.TPU.MESH_SHAPE))
    if mesh.size == 1:
        mesh = None

    ev = Evaluator3D(cfg, model, variables, mode=mode, mesh=mesh)
    results = ev.run(loader, views=args.views, output_dir=args.out)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
