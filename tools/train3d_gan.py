"""WGAN-regularised 3D training driver.

Equivalent of reference tools/train3D_GAN.py:96-440.

    python tools/train3d_gan.py --cfg <exp.yaml>
"""

from __future__ import annotations

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    args = base_parser(__doc__).parse_args()
    setup_platform(args.platform)

    from hrnet_hand_pose_estimation_tpu.core.trainer3d_gan import TrainerGAN3D
    from hrnet_hand_pose_estimation_tpu.data.build import make_dataloader
    from hrnet_hand_pose_estimation_tpu.models.triangulation import build_triangulation_net

    cfg = load_cfg(args)
    model = build_triangulation_net(cfg)
    train_loaders = make_dataloader(cfg, is_train=True)
    val_loaders = {} if cfg.WITHOUT_EVAL else make_dataloader(cfg, is_train=False)
    TrainerGAN3D(cfg, model, train_loaders, val_loaders).fit()


if __name__ == "__main__":
    main()
