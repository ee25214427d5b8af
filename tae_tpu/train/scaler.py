"""Dynamic loss scaling (API-parity shim).

The reference trains fp16 under a dynamic-loss-scale GradScaler
(reference util/misc.py:245-271). bf16 on TPU has fp32's exponent range, so
the default tae_tpu policy needs no scaling — this module exists for API
parity and for experiments with fp16-style narrow-range dtypes: torch
GradScaler semantics (scale the loss; on non-finite grads skip the step and
halve the scale; after ``growth_interval`` clean steps double it), expressed
functionally so it composes with jitted train steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class ScalerState(NamedTuple):
    scale: jnp.ndarray          # ()
    growth_tracker: jnp.ndarray  # () consecutive finite steps

    @classmethod
    def create(cls, init_scale: float = 2.0 ** 16) -> "ScalerState":
        return cls(scale=jnp.float32(init_scale),
                   growth_tracker=jnp.zeros((), jnp.int32))


class DynamicLossScale:
    """Functional GradScaler. Use inside a loss fn / train step:

        loss_scaled = scaler.scale(state, loss)
        grads = ... d loss_scaled ...
        grads, state, finite = scaler.unscale_and_update(state, grads)
        # apply the optimizer update only where ``finite``
    """

    def __init__(self, growth_factor: float = 2.0, backoff_factor: float = 0.5,
                 growth_interval: int = 2000):
        self.growth_factor = growth_factor
        self.backoff_factor = backoff_factor
        self.growth_interval = growth_interval

    def scale(self, state: ScalerState, loss: jnp.ndarray) -> jnp.ndarray:
        return loss * state.scale.astype(loss.dtype)

    def unscale_and_update(self, state: ScalerState, grads: Any
                           ) -> tuple[Any, ScalerState, jnp.ndarray]:
        inv = 1.0 / state.scale
        grads = jax.tree.map(lambda g: g.astype(jnp.float32) * inv, grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        tracker = jnp.where(finite, state.growth_tracker + 1, 0)
        grow = tracker >= self.growth_interval
        new_scale = jnp.where(
            finite,
            jnp.where(grow, state.scale * self.growth_factor, state.scale),
            state.scale * self.backoff_factor)
        tracker = jnp.where(grow, 0, tracker)
        # zero non-finite grads so a masked optimizer step is a clean no-op
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        return grads, ScalerState(new_scale, tracker), finite


class NoOpLossScale:
    """The bf16 default: identity scaling (kept for interface parity)."""

    def scale(self, state, loss):
        return loss

    def unscale_and_update(self, state, grads):
        return grads, state, jnp.bool_(True)
