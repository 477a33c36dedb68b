"""3D multi-view training driver.

Equivalent of reference tools/train3D.py:95-429: build the triangulation net
named by MODEL.TRIANGULATION_MODEL_NAME ('alg' | 'ransac' | 'vol'), train on
the multi-view loader with per-module learning rates and frozen backbone
layers.

    python tools/train3d.py --cfg experiments/VolTriangulation_MHP_v2.yaml
    python tools/train3d.py --cfg experiments/synthetic_vol_smoke.yaml --platform cpu
"""

from __future__ import annotations

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    args = base_parser(__doc__).parse_args()
    setup_platform(args.platform)

    from hrnet_hand_pose_estimation_tpu.core.trainer3d import Trainer3D
    from hrnet_hand_pose_estimation_tpu.data.build import make_dataloader
    from hrnet_hand_pose_estimation_tpu.models.triangulation import build_triangulation_net

    cfg = load_cfg(args)
    model = build_triangulation_net(cfg)

    train_loaders = make_dataloader(cfg, is_train=True)
    val_loaders = {} if cfg.WITHOUT_EVAL else make_dataloader(cfg, is_train=False)
    trainer = Trainer3D(cfg, model, train_loaders, val_loaders)
    trainer.fit()


if __name__ == "__main__":
    main()
