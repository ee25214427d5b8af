"""Jitted train/eval step factories.

The whole step — forward, backward, grad-accumulation, AdamW update, metric
scalars — is one XLA program (the TPU equivalent of the reference's
autocast-forward / scaler-backward / fused-AdamW sequence, train.py:136-150).
The factories are sharding-agnostic: drivers jit the returned function under
a Mesh with NamedShardings (see tae_tpu.parallel) and XLA inserts the
gradient collectives; nothing here talks to devices explicitly.

Deliberate divergence from the reference (SURVEY.md §7 "quirks"): no
per-step ``loss.item()`` / ``cuda.synchronize()`` — metrics come back as
device scalars and drivers fetch them at logging frequency only.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from tae_tpu.train.optim import AdamWState, Optimizer

Params = Any
Batch = Any
# loss_fn(params, batch) -> (loss, aux_metrics_dict)
LossFn = Callable[[Params, Batch], tuple[jnp.ndarray, dict[str, jnp.ndarray]]]


class TrainState(NamedTuple):
    params: Params
    opt: AdamWState

    @classmethod
    def create(cls, params: Params, optimizer: Optimizer) -> "TrainState":
        return cls(params=params, opt=optimizer.init(params))


def global_norm(tree: Params) -> jnp.ndarray:
    """L2 norm over all leaves (the reference logs this via get_grad_norm_,
    util/misc.py:274-286)."""
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree.leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.asarray(leaves)))


def _microbatch(batch: Batch, accum_iter: int) -> Batch:
    """Reshape every leaf (B, ...) -> (accum_iter, B // accum_iter, ...)."""
    def split(x):
        b = x.shape[0]
        if b % accum_iter:
            raise ValueError(f"batch dim {b} not divisible by accum_iter {accum_iter}")
        return x.reshape(accum_iter, b // accum_iter, *x.shape[1:])

    return jax.tree.map(split, batch)


def make_train_step(loss_fn: LossFn, optimizer: Optimizer,
                    schedule: Callable[[jnp.ndarray], jnp.ndarray],
                    accum_iter: int = 1,
                    clip_grad: float | None = None):
    """Build ``step(state, batch, it) -> (state, metrics)``.

    ``accum_iter > 1`` runs a ``lax.scan`` over microbatches, averaging
    gradients before a single optimizer update — same effective batch
    semantics as the reference's loss/accum_iter division (train.py:145-148)
    without holding multiple gradient buffers.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch: Batch, it: jnp.ndarray
             ) -> tuple[TrainState, dict[str, jnp.ndarray]]:
        lr = schedule(it)

        if accum_iter == 1:
            (loss, aux), grads = grad_fn(state.params, batch)
        else:
            micro = _microbatch(batch, accum_iter)

            def body(carry, mb):
                (l, a), g = grad_fn(state.params, mb)
                g_acc = jax.tree.map(jnp.add, carry, g)
                return g_acc, (l, a)

            zero = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                state.params)
            g_sum, (losses, auxes) = jax.lax.scan(body, zero, micro)
            grads = jax.tree.map(lambda g: g / accum_iter, g_sum)
            loss = jnp.mean(losses)
            aux = jax.tree.map(jnp.mean, auxes)

        gnorm = global_norm(grads)
        if clip_grad is not None:
            scale = jnp.minimum(1.0, clip_grad / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        params, opt = optimizer.update(state.params, state.opt, grads, lr)
        metrics = {"loss": loss, "lr": lr, "grad_norm": gnorm, **aux}
        return TrainState(params, opt), metrics

    return step


def make_eval_step(loss_fn: LossFn):
    def eval_step(params: Params, batch: Batch) -> dict[str, jnp.ndarray]:
        loss, aux = loss_fn(params, batch)
        return {"loss": loss, **aux}

    return eval_step
