"""Inference-time BatchNorm folding.

Folds eval-mode BatchNorm affine+statistics into the preceding conv's
kernel/bias, eliminating every per-channel normalisation pass from the
inference graph (y = scale*(conv(x)-mean)/sqrt(var+eps)+bias becomes a
conv with rescaled kernel and adjusted bias).  Mathematically exact for
``train=False``; do not use the folded tree for training.

Works structurally: any params subtree shaped {conv: {kernel[, bias]},
bn: {scale, bias}} with matching batch_stats {bn: {mean, var}} is folded
(this matches every ConvBN in models/layers.py); the bn entries are
rewritten to identity (scale=1, bias=folded, mean=0, var=1-eps).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..models.layers import BN_EPS


def fold_batchnorm(variables: Dict[str, Any], eps: float = BN_EPS) -> Dict[str, Any]:
    """Return a new {'params', 'batch_stats'} tree with BN folded into convs."""
    import copy

    params = copy.deepcopy(jnp_to_dict(variables["params"]))
    stats = copy.deepcopy(jnp_to_dict(variables.get("batch_stats", {})))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return
        if ("conv" in p_node and "bn" in p_node
                and isinstance(p_node["conv"], dict) and "kernel" in p_node["conv"]
                and isinstance(s_node, dict) and "bn" in s_node):
            conv = p_node["conv"]
            bn = p_node["bn"]
            st = s_node["bn"]
            inv = bn["scale"] / jnp.sqrt(st["var"] + eps)
            conv["kernel"] = conv["kernel"] * inv  # broadcast over out-channels
            # the additive part stays in the (now-trivial) bn: x + bias'
            # (a conv without use_bias cannot grow a bias param in flax)
            if "bias" in conv:
                conv["bias"] = conv["bias"] * inv
            bn["bias"] = bn["bias"] - st["mean"] * inv
            bn["scale"] = jnp.ones_like(bn["scale"])
            st["mean"] = jnp.zeros_like(st["mean"])
            st["var"] = jnp.full_like(st["var"], 1.0 - eps)
        for k, v in p_node.items():
            if isinstance(v, dict):
                walk(v, s_node.get(k, {}) if isinstance(s_node, dict) else {})

    walk(params, stats)
    return {"params": params, "batch_stats": stats}


def jnp_to_dict(tree):
    if isinstance(tree, dict):
        return {k: jnp_to_dict(v) for k, v in tree.items()}
    return tree
