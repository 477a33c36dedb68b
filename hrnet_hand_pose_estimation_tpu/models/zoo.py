"""Model registrations.

One ``@register(name)`` builder per reference model entry point
(each reference model exposes ``get_pose_net(cfg, is_train)``; see SURVEY.md
section 2.3).  Names match the reference's ``MODEL.NAME`` strings so the 69
experiment YAMLs resolve unchanged.
"""

from __future__ import annotations

from .hrnet import hrnet_from_cfg
from .registry import register


@register("pose_hrnet")
def _pose_hrnet(cfg):
    """Plain HRNet emitting raw heatmap logits (reference lib/models/pose_hrnet.py:603)."""
    return hrnet_from_cfg(cfg, head="plain")


@register("pose_hrnet_softmax")
def _pose_hrnet_softmax(cfg):
    """HRNet + spatial-softmax head with (optionally trainable) temperature
    (reference lib/models/pose_hrnet_softmax.py:563)."""
    return hrnet_from_cfg(cfg, head="softmax")


@register("pose_hrnet_volumetric")
def _pose_hrnet_volumetric(cfg):
    """Softmax HRNet + confidence heads; backbone of the triangulation nets
    (reference lib/models/pose_hrnet_volumetric.py:675)."""
    return hrnet_from_cfg(
        cfg, head="softmax",
        vol_confidences=bool(cfg.MODEL.VOL_CONFIDENCES),
        alg_confidences=bool(cfg.MODEL.ALG_CONFIDENCES),
    )


@register("pose_hrnet_trainable_softmax")
def _pose_hrnet_trainable_softmax(cfg):
    """Alias used by a few MHP YAMLs: softmax head with the temperature
    parameter trainable regardless of MODEL.TRAINABLE_SOFTMAX."""
    return hrnet_from_cfg(cfg, head="softmax", trainable_softmax=True)


@register("pose_resnet")
def _pose_resnet(cfg):
    """SimpleBaseline deconv-head ResNet (reference lib/models/pose_resnet.py:271)."""
    from .pose_resnet import pose_resnet_from_cfg

    return pose_resnet_from_cfg(cfg)


@register("CPM")
def _cpm(cfg):
    """Convolutional Pose Machine (reference lib/models/CPM.py:171)."""
    from .cpm import CPM

    return CPM(num_joints=int(cfg.MODEL.NUM_JOINTS))


@register("FTL")
def _ftl(cfg):
    """Feature-transform-layer multiview net (reference FTL_encoder_decoder.py:83)."""
    from .ftl import FTLMultiviewNet

    return FTLMultiviewNet(
        backbone=hrnet_from_cfg(cfg, head="softmax"),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        num_views=int(cfg.DATASET.NUM_VIEWS),
    )


@register("swin_transformer")
def _swin(cfg):
    """Swin backbone + pose head (reference lib/models/swin_transformer.py:569-837)."""
    from .swin import swin_from_cfg

    return swin_from_cfg(cfg)


@register("HourGlass")
def _hourglass(cfg):
    """Stacked hourglass filter bank (reference lib/models/HourGlass.py:124-226)."""
    from .hourglass import hourglass_from_cfg

    return hourglass_from_cfg(cfg)


@register("pose_hrnet_hamburger")
def _hamburger(cfg):
    """HRNet + matrix-decomposition context head
    (reference lib/models/pose_hrnet_hamburger.py:17-88)."""
    from .hamburger import hamburger_from_cfg

    return hamburger_from_cfg(cfg)


@register("pose_hrnet_transformer")
def _pose_hrnet_transformer(cfg):
    """Temporal PoseFormer refinement (reference pose_hrnet_transformer.py:87-245)."""
    from .transformers import PoseTransformer

    return PoseTransformer(
        backbone=hrnet_from_cfg(cfg, head="softmax"),
        num_frames=len(list(cfg.DATASET.SEQ_IDX)),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        use_softmax=bool(cfg.MODEL.HEATMAP_SOFTMAX),
    )


@register("my_pose_transformer")
def _my_pose_transformer(cfg):
    """RVT pooling transformer (reference my_pose_transformer.py:190-370)."""
    from .transformers import PoolingTransformer

    layers = 50
    name = str(cfg.MODEL.BACKBONE_NAME).lower()
    if "resnet" in name:
        digits = "".join(c for c in name if c.isdigit())
        layers = int(digits) if digits else 50
    return PoolingTransformer(
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        backbone_layers=layers,
        patch_size=int(cfg.MODEL.PATCH_SIZE),
        base_dims=tuple(int(d) for d in cfg.MODEL.EMB_DIM),
        depths=tuple(int(d) for d in cfg.MODEL.DEPTHS)[: len(cfg.MODEL.EMB_DIM)],
        num_heads=tuple(int(h) for h in cfg.MODEL.NUM_HEADS)[: len(cfg.MODEL.EMB_DIM)],
        heatmap_size=int(cfg.MODEL.HEATMAP_SIZE[0]),
    )


@register("pose_hrnet_PoseAggr")
def _pose_aggr(cfg):
    """Deformable temporal aggregation (reference pose_hrnet_PoseAggr.py:287-738)."""
    from .pose_aggr import PoseAggrNet

    return PoseAggrNet(
        # logits backbone: the reference softmaxes AFTER aggregation (:644-648)
        backbone=hrnet_from_cfg(cfg, head="plain"),
        seq_len=len(list(cfg.DATASET.SEQ_IDX)),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        dilation_rates=tuple(int(d) for d in cfg.MODEL.DILATION_RATES),
        heatmap_softmax=bool(cfg.MODEL.HEATMAP_SOFTMAX),
        trainable_softmax=bool(cfg.MODEL.TRAINABLE_SOFTMAX),
    )


@register("HRNet_PredRNN")
def _predrnn(cfg):
    """HRNet + PredRNN temporal refinement (reference predrnn.py:186-236)."""
    from .temporal import HRNetPredRNN

    return HRNetPredRNN(
        backbone=hrnet_from_cfg(cfg, head="softmax"),
        num_hidden=tuple(int(n) for n in cfg.MODEL.N_HIDDEN),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        use_softmax=bool(cfg.MODEL.HEATMAP_SOFTMAX),
    )


@register("HRNet_Emb_TCN")
def _tcn(cfg):
    """HRNet embeddings + temporal convs (reference hrnet_emb_model.py:186-236)."""
    from .temporal import HRNetEmbTCN

    return HRNetEmbTCN(
        backbone=hrnet_from_cfg(cfg, head="softmax"),
        embedding_size=int(cfg.MODEL.EMBEDDING_SIZE),
        tcn_channels=int(cfg.MODEL.TCN_CHANNELS),
        filter_widths=tuple(int(f) for f in cfg.MODEL.FILTER_WIDTHS),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
    )


@register("multiview_pose_hrnet")
def _multiview_pose_hrnet(cfg):
    """Cross-view fusion net (reference lib/models/multiview_pose_hrnet.py:74)."""
    from .multiview_hrnet import MultiViewPoseNet

    return MultiViewPoseNet(
        backbone=hrnet_from_cfg(cfg, head="softmax"),
        n_views=int(cfg.DATASET.NUM_VIEWS),
        hm_size=int(cfg.MODEL.HEATMAP_SIZE[0]),
        aggre=bool(cfg.MODEL.AGGRE),
    )


# 3D triangulation nets, keyed like the reference tools/train3D.py:152-158
# registry ({'ransac', 'alg', 'vol'} via MODEL.TRIANGULATION_MODEL_NAME).
@register("alg")
def _alg(cfg):
    from .triangulation import build_triangulation_net

    return build_triangulation_net(cfg, "alg")


@register("ransac")
def _ransac(cfg):
    from .triangulation import build_triangulation_net

    return build_triangulation_net(cfg, "ransac")


@register("vol")
def _vol(cfg):
    from .triangulation import build_triangulation_net

    return build_triangulation_net(cfg, "vol")


@register("vol_CPM")
def _vol_cpm(cfg):
    """CPM-backed volumetric triangulation (reference triangulation.py:472)."""
    from .triangulation import build_triangulation_net

    return build_triangulation_net(cfg, "vol_CPM")
