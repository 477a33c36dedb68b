"""Full-test-set 2D evaluation.

Equivalent of reference tools/evaluate_2D.py:61-297: batch forward over the
raw eval dataset, decode, rescale to original image, accumulate EPE/PCK,
write ``eval2D_results_<EXP>/{mse2d_each_joint,PCK2d}.txt``.

    python tools/evaluate_2d.py --cfg <exp.yaml> --model_path <ckpt>
"""

from __future__ import annotations

import json

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--out", default="tools", help="artifact directory root")
    p.add_argument("--serving", default="std", choices=("std", "int8"),
                   help="evaluate the standard forward or the calibrated "
                        "int8 W8A8 serving path (deployment-accuracy check)")
    p.add_argument("--calib", default="",
                   help="saved calibration record (tools/calibrate.py) for "
                        "--serving int8; default calibrates on the first "
                        "eval batch")
    args = p.parse_args()
    setup_platform(args.platform)

    import jax

    from hrnet_hand_pose_estimation_tpu.core.evaluator import Evaluator2D
    from hrnet_hand_pose_estimation_tpu.data.build import make_test_dataloader
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.parallel.checkpoint import load_pretrained

    cfg = load_cfg(args)
    model = build_model(cfg)

    loaders = make_test_dataloader(cfg)
    name, loader = next(iter(loaders.items()))

    if args.model_path:
        variables = load_pretrained(args.model_path)
    else:  # random init (smoke mode)
        import jax.numpy as jnp

        sample = next(iter(loader))
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.key(0), jnp.asarray(sample["imgs"][:1]), False)

    # multi-device eval runs data-parallel over the same mesh the trainer
    # would use (reference eval wraps the model in DataParallel,
    # tools/evaluate_2D.py:176-231)
    from hrnet_hand_pose_estimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(tuple(cfg.TPU.MESH_AXES), tuple(cfg.TPU.MESH_SHAPE))
    if mesh.size == 1:
        mesh = None

    evaluator = Evaluator2D(cfg, model, variables, mesh=mesh,
                            serving=args.serving, calib_path=args.calib)
    results = evaluator.run(loader, dataset_name=name, output_dir=args.out)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
