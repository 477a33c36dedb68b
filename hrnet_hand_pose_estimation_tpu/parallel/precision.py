"""Mixed-precision policy + loss scaling (fp16 parity module).

The reference vendors an Apex-style fp16 stack (lib/fp16_utils/):
``network_to_half`` wrappers (fp16util.py:40-93), master-fp32
``FP16_Optimizer`` (fp16_optimizer.py:45) and an overflow-backoff
``DynamicLossScaler`` (loss_scaler.py:45-81).  On TPU, bf16 compute with
fp32 params needs none of that — it is the framework default
(TPU.COMPUTE_DTYPE) — but the loss-scaling machinery is kept for numeric
parity experiments and fp16-style studies, as a pure optax wrapper.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class LossScaleState(NamedTuple):
    scale: jax.Array          # current loss scale
    growth_counter: jax.Array # consecutive overflow-free steps


class DynamicLossScaler:
    """Overflow-backoff scaler (reference loss_scaler.py:45-81 semantics:
    halve on overflow, double after ``scale_window`` clean steps)."""

    def __init__(self, init_scale: float = 2.0**15, scale_factor: float = 2.0,
                 scale_window: int = 1000):
        self.init_scale = init_scale
        self.factor = scale_factor
        self.window = scale_window

    def init(self) -> LossScaleState:
        return LossScaleState(jnp.asarray(self.init_scale, jnp.float32),
                              jnp.zeros((), jnp.int32))

    def scale_loss(self, loss: jax.Array, state: LossScaleState) -> jax.Array:
        return loss * state.scale

    def unscale_and_update(self, grads, state: LossScaleState
                           ) -> Tuple[Any, LossScaleState, jax.Array]:
        """Unscale grads; detect inf/nan overflow; adjust the scale.
        Returns (grads, new_state, overflow_flag) — callers skip the
        optimizer step when overflow is set (FP16_Optimizer behaviour)."""
        inv = 1.0 / state.scale
        grads = jax.tree.map(lambda g: g * inv, grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        overflow = ~finite

        new_scale = jnp.where(overflow, state.scale / self.factor, state.scale)
        counter = jnp.where(overflow, 0, state.growth_counter + 1)
        grow = counter >= self.window
        new_scale = jnp.where(grow, new_scale * self.factor, new_scale)
        counter = jnp.where(grow, 0, counter)
        return grads, LossScaleState(new_scale, counter), overflow


def apply_updates_unless_overflow(params, updates, overflow: jax.Array):
    """Skip the step on overflow (reference FP16_Optimizer.step)."""
    zeros = jax.tree.map(jnp.zeros_like, updates)
    safe = jax.tree.map(lambda u, z: jnp.where(overflow, z, u), updates, zeros)
    return optax.apply_updates(params, safe)


def cast_to_compute(tree, dtype=jnp.bfloat16):
    """network_to_half analog: cast floating leaves to the compute dtype
    (BatchNorm stats/params stay fp32 in the model definitions already)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)
