"""Production inference fast path: Pallas-fused layer1 + head + decode.

Composes the HRNet backbone (with the fused layer1 kernel) applied directly
on the ``backbone`` variables subtree with the fused head+decode kernel —
the highest-throughput single-chip serving configuration (see PERF.md).
Numerics are eval-exact up to bf16 rounding (BN folded analytically).

    fn = make_fast_infer(cfg)
    coords = fn(variables, images)   # (B, K, 2) heatmap-pixel coords
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.hrnet import HRNetBackbone, StageCfg
from ..ops.pallas.fused_head_decode import fused_head_decode, prepare_head_params


def make_fast_infer(cfg, pallas_layer1: bool = True,
                    pallas_branches: bool = False, interpret: bool = False):
    # pallas_branches defaults OFF: the per-branch BasicBlock kernels measured
    # 4x slower than XLA on TPU (tiny per-program work serialises branches XLA
    # runs concurrently; PERF.md) — kept for experimentation only.
    extra = cfg.MODEL.EXTRA
    backbone = HRNetBackbone(
        stage2=StageCfg.from_cfg(extra["STAGE2"]),
        stage3=StageCfg.from_cfg(extra["STAGE3"]),
        stage4=StageCfg.from_cfg(extra["STAGE4"]),
        dtype=jnp.bfloat16,
        pallas_layer1=pallas_layer1,
        pallas_branches=pallas_branches,
    )

    @jax.jit
    def infer(variables, images):
        bb_vars = {
            "params": variables["params"]["backbone"],
            "batch_stats": variables["batch_stats"]["backbone"],
        }
        xs = backbone.apply(bb_vars, images, False)
        head = prepare_head_params(variables)
        return fused_head_decode(xs, head, interpret=interpret)

    return infer
