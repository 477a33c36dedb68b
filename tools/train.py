"""2D training driver.

Equivalent of reference tools/train.py:95-424: build config/model/loaders,
train with per-epoch validation, checkpoints and best-model snapshots.

    python tools/train.py --cfg experiments/RHD_HRNet_w32_trainable_softmax.yaml
    python tools/train.py --cfg ... --platform cpu DATASET.DATASET "['Synthetic_kpt']"
"""

from __future__ import annotations

from _common import base_parser, load_cfg, setup_platform


def main() -> None:
    args = base_parser(__doc__).parse_args()
    setup_platform(args.platform)

    import jax

    from hrnet_hand_pose_estimation_tpu.core.trainer import Trainer
    from hrnet_hand_pose_estimation_tpu.data.build import make_dataloader
    from hrnet_hand_pose_estimation_tpu.models import build_model
    from hrnet_hand_pose_estimation_tpu.utils.summary import model_summary

    cfg = load_cfg(args)
    model = build_model(cfg)

    train_loaders = make_dataloader(cfg, is_train=True)
    val_loaders = {} if cfg.WITHOUT_EVAL else make_dataloader(cfg, is_train=False)

    trainer = Trainer(cfg, model, train_loaders, val_loaders)
    trainer.logger.info("devices: %s", jax.devices())
    trainer.logger.info("%s", model_summary(model, cfg))
    trainer.fit()


if __name__ == "__main__":
    main()
