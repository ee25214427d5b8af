"""First-party AdamW and LR schedules with torch-matching semantics.

The reference uses ``torch.optim.AdamW(fused=True)`` with betas (0.9, 0.95)
and weight decay disabled for 1-D params/biases (reference train.py:108-109,
util/misc.py:364-379). Its "fused CUDA kernel" speed trick is unnecessary on
TPU: the whole update below lives inside the jitted train step, so XLA fuses
it into a handful of elementwise kernels (SURVEY.md §2.1 N3).

Update rule is exactly torch.optim.AdamW (decoupled decay applied *before*
the moment step, bias-corrected moments):

    p   <- p · (1 − lr·wd)
    m   <- β₁ m + (1−β₁) g;     v <- β₂ v + (1−β₂) g²
    p   <- p − lr · (m/(1−β₁ᵗ)) / (sqrt(v/(1−β₂ᵗ)) + eps)

The optimizer is exposed optax-style as an (init_fn, update_fn) pair; the lr
is passed per-step so schedules stay host-side data, not retraces.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

Params = Any


class AdamWState(NamedTuple):
    step: jnp.ndarray   # ()
    mu: Params          # first moment
    nu: Params          # second moment


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable[[Params], AdamWState]
    update: Callable[..., tuple[Params, AdamWState]]


def no_decay_mask(params: Params) -> Params:
    """True where weight decay applies. Matches the reference's
    ``add_weight_decay(bias_wd=False)`` rule (util/misc.py:364-379): every
    parameter with ndim == 1 (biases, LayerNorm scales/biases) is excluded;
    everything else — including the 3-D positional embeddings — decays."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def adamw(b1: float = 0.9, b2: float = 0.95, eps: float = 1e-8,
          weight_decay: float = 0.0, moment_dtype=None) -> Optimizer:
    """``moment_dtype`` (e.g. jnp.bfloat16) stores both moments in a reduced
    dtype — halves optimizer-state HBM for memory-bound big configs (the
    moment update still computes in fp32)."""
    def init_fn(params: Params) -> AdamWState:
        zeros = lambda p: jnp.zeros(p.shape, moment_dtype or p.dtype)  # noqa: E731
        return AdamWState(step=jnp.zeros((), jnp.int32),
                          mu=jax.tree.map(zeros, params),
                          nu=jax.tree.map(zeros, params))

    def update_fn(params: Params, state: AdamWState, grads: Params,
                  lr: jnp.ndarray) -> tuple[Params, AdamWState]:
        step = state.step + 1
        c1 = 1.0 - b1 ** step.astype(jnp.float32)
        c2 = 1.0 - b2 ** step.astype(jnp.float32)
        decay_mask = no_decay_mask(params)

        def upd(p, g, m, v, decays):
            g = g.astype(jnp.float32)
            if weight_decay and decays:
                p = p * (1.0 - lr * weight_decay)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
            p = (p.astype(jnp.float32)
                 - lr * (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)).astype(p.dtype)
            return p, m32.astype(m.dtype), v32.astype(v.dtype)

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_d = treedef.flatten_up_to(decay_mask)
        out = [upd(p, g, m, v, d) for p, g, m, v, d in
               zip(flat_p, flat_g, flat_m, flat_v, flat_d)]
        new_p = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        return new_p, AdamWState(step=step, mu=new_m, nu=new_v)

    return Optimizer(init=init_fn, update=update_fn)


def step_lr(max_lr: float, min_lr: float, switch_it: int) -> Callable[[int], float]:
    """The reference's 2-level step schedule (util/misc.py:400-413):
    max_lr until ``switch_it``, min_lr after."""
    def schedule(it) -> jnp.ndarray:
        return jnp.where(it < switch_it, max_lr, min_lr).astype(jnp.float32)

    return schedule


def epoch_step_lr(base_lr: float, step_size: int = 90, gamma: float = 0.1
                  ) -> Callable[[int], float]:
    """torch StepLR semantics (reference recognition/train_recognition_in1k.py:121,
    segmentation/train.py:151): lr = base · γ^(epoch // step_size)."""
    def schedule(epoch) -> jnp.ndarray:
        k = jnp.asarray(epoch) // step_size
        return (base_lr * gamma ** k.astype(jnp.float32)).astype(jnp.float32)

    return schedule
