"""Config system tests: defaults, YAML parity with the reference experiments,
override semantics, freezing."""

import glob

import pytest

from hrnet_hand_pose_estimation_tpu.config import default_config, load_config

REF_EXPERIMENTS = sorted(glob.glob("/root/reference/experiments/**/*.yaml", recursive=True))


def test_defaults_shape():
    cfg = default_config()
    assert cfg.MODEL.NUM_JOINTS == 21
    assert cfg.MODEL.IMAGE_SIZE == [256, 256]
    assert cfg.LOSS.WITH_HEATMAP_LOSS is True
    assert cfg.TRAIN.OPTIMIZER == "adam"
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"


@pytest.mark.skipif(not REF_EXPERIMENTS, reason="reference experiments not mounted")
def test_all_reference_yamls_load():
    """Every one of the reference's experiment YAMLs must merge cleanly."""
    assert len(REF_EXPERIMENTS) >= 60
    for path in REF_EXPERIMENTS:
        cfg = load_config(path)
        assert cfg.MODEL.NAME, path
        assert cfg.MODEL.NUM_JOINTS >= 21 or cfg.MODEL.NUM_JOINTS == 17, path


@pytest.mark.skipif(not REF_EXPERIMENTS, reason="reference experiments not mounted")
def test_rhd_trainable_softmax_yaml_values():
    cfg = load_config(
        "/root/reference/experiments/RHD/RHD_HRNet_w32_trainable_softmax_pose2dloss_v1.yaml"
    )
    assert cfg.MODEL.NAME == "pose_hrnet_softmax"
    assert cfg.MODEL.TRAINABLE_SOFTMAX is True
    assert cfg.MODEL.HEATMAP_SOFTMAX is True
    assert cfg.LOSS.WITH_POSE2D_LOSS is True
    assert cfg.LOSS.WITH_HEATMAP_LOSS is False
    assert cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS == [32, 64, 128, 256]
    assert cfg.TRAIN.LR_STEP == [24, 48, 72]
    assert cfg.GPUS == [4, 5]  # tuple-string parsing


def test_dotlist_override():
    cfg = load_config(opts=["TRAIN.LR", "0.01", "MODEL.NAME", "pose_hrnet"])
    assert cfg.TRAIN.LR == 0.01
    assert cfg.MODEL.NAME == "pose_hrnet"


def test_unknown_key_rejected():
    cfg = default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_mapping({"NOT_A_KEY": 1})


def test_extra_is_open():
    cfg = default_config()
    cfg.MODEL.EXTRA.merge_from_mapping({"ANYTHING": {"GOES": 1}})
    assert cfg.MODEL.EXTRA.ANYTHING.GOES == 1


def test_freeze():
    cfg = load_config()
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 1.0


def test_dotlist_yaml_style_booleans():
    cfg = load_config(opts=["LOSS.WITH_HEATMAP_LOSS", "false",
                            "TEST.FLIP_TEST", "true"])
    assert cfg.LOSS.WITH_HEATMAP_LOSS is False
    assert cfg.TEST.FLIP_TEST is True
