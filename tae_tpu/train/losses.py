"""Classification losses and accuracy metrics.

Matches torch semantics used by the reference: ``CrossEntropyLoss`` with
integer or probability targets and optional label smoothing
(reference recognition/train_recognition_in1k.py:122: smoothing 0.1;
in19k uses plain CE), and top-k accuracy (reference util/misc.py:383-397,
reported in percent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """logits (B, C); targets int (B,) or soft distributions (B, C).

    torch semantics: smoothing mixes the target with uniform 1/C; loss is
    the mean over the batch, computed in fp32.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    c = logits.shape[-1]
    if targets.ndim == logits.ndim:
        t = targets.astype(jnp.float32)
    else:
        t = jax.nn.one_hot(targets, c, dtype=jnp.float32)
    if label_smoothing:
        t = t * (1.0 - label_smoothing) + label_smoothing / c
    return -jnp.mean(jnp.sum(t * logp, axis=-1))


def topk_accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
                  ks: tuple[int, ...] = (1, 5)) -> dict[str, jnp.ndarray]:
    """Percent accuracy over the batch for each k. Integer targets only
    (mixup batches report against the dominant label like torchvision)."""
    if targets.ndim == logits.ndim:  # soft targets -> dominant class
        targets = jnp.argmax(targets, axis=-1)
    out = {}
    c = logits.shape[-1]
    maxk = min(max(ks), c)  # tolerate tiny label spaces (k clamps to C)
    _, pred = jax.lax.top_k(logits.astype(jnp.float32), maxk)  # (B, maxk)
    correct = pred == targets[:, None]
    for k in ks:
        out[f"acc{k}"] = 100.0 * jnp.mean(jnp.any(correct[:, :min(k, c)], axis=-1)
                                          .astype(jnp.float32))
    return out
