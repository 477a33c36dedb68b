"""Model summaries: parameter counts + FLOP estimates.

Replaces reference lib/utils/utils.py:117-233 (hook-based get_model_summary):
parameters come from the initialized pytree, FLOPs from XLA's own cost
analysis of the compiled forward — more faithful than the reference's
hand-counted conv multiply-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def model_summary(model, cfg, batch: int = 1) -> str:
    h, w = int(cfg.MODEL.IMAGE_SIZE[1]), int(cfg.MODEL.IMAGE_SIZE[0])
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    # CPM's signature is (image, centermap, train)
    extra = ((jnp.zeros((batch, h, w, 1), jnp.float32),)
             if str(cfg.MODEL.NAME) == "CPM" else ())
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x, *extra,
                                               False))
    n_params = sum(int(jnp.prod(jnp.asarray(s.shape))) if s.shape else 1
                   for s in jax.tree.leaves(shapes["params"]))
    line = f"Model {type(model).__name__}: {n_params/1e6:.2f}M params @ {h}x{w}"
    try:
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        lowered = jax.jit(lambda v, x: model.apply(v, x, *extra, False)).lower(
            variables, x)
        cost = lowered.compile().cost_analysis()
        flops = cost.get("flops", 0.0)
        line += f", {flops/1e9:.2f} GFLOPs/batch (XLA cost analysis)"
    except Exception:
        pass
    return line
