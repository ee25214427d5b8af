"""Confusion matrix for segmentation evaluation (pixel acc + IoU).

Equivalent of the reference's ConfusionMatrix
(reference segmentation/utils.py:66-100): bincount-based update over valid
pixels (0 <= target < num_classes), global/per-class accuracy, per-class IoU
and mean IoU, cross-process reduction, and the same printable summary.
Updates run as a jitted device op; the matrix accumulates on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2,))
def _update(target: jnp.ndarray, pred: jnp.ndarray, n: int) -> jnp.ndarray:
    t = target.reshape(-1)
    p = pred.reshape(-1)
    valid = (t >= 0) & (t < n)
    idx = jnp.where(valid, n * t + p, n * n)  # invalid pixels -> overflow bin
    counts = jnp.bincount(idx, length=n * n + 1)
    return counts[: n * n].reshape(n, n)


class ConfusionMatrix:
    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, target, pred) -> None:
        self.mat += np.asarray(
            _update(jnp.asarray(target, jnp.int32), jnp.asarray(pred, jnp.int32),
                    self.num_classes), np.int64)

    def reset(self) -> None:
        self.mat[:] = 0

    def compute(self) -> tuple[float, np.ndarray, np.ndarray]:
        h = self.mat.astype(np.float64)
        diag = np.diag(h)
        acc_global = diag.sum() / max(h.sum(), 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            acc = diag / h.sum(1)
            iou = diag / (h.sum(1) + h.sum(0) - diag)
        return float(acc_global), acc, iou

    def reduce_from_all_processes(self) -> None:
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(self.mat)
        self.mat = np.asarray(gathered).sum(axis=0).astype(np.int64)

    @property
    def mean_iou(self) -> float:
        _, _, iou = self.compute()
        return float(np.nanmean(iou))

    def __str__(self) -> str:
        acc_global, acc, iou = self.compute()
        return ("global correct: {:.1f}\naverage row correct: {}\n"
                "IoU: {}\nmean IoU: {:.1f}").format(
            acc_global * 100,
            [f"{i:.1f}" for i in (acc * 100).tolist()],
            [f"{i:.1f}" for i in (iou * 100).tolist()],
            float(np.nanmean(iou)) * 100)
