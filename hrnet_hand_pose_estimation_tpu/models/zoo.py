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
