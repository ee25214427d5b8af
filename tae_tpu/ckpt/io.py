"""Checkpoint save/restore.

Orbax-backed sharded checkpointing (each leaf saved with its sharding; scales
to multi-host) plus a JSON metadata sidecar carrying step / args / best
metric — the TPU-native equivalent of the reference's single-file
``torch.save({model, optimizer, args, iteration, scaler})``
(reference train.py:163-171, util/misc.py:289-304).

``load_params`` additionally accepts a PyTorch ``.pth`` reference checkpoint
and converts it via :mod:`tae_tpu.ckpt.torch_import` — this implements the
*intended* behavior of the reference's broken ``evaluate.py:78`` load call
(SURVEY.md §2.3: kwargs-mismatch bug; we load from ``--resume`` properly).

Positional embeddings whose token grid differs from the model's are
bicubically interpolated on load (reference util/misc.py:326-350).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.ckpt.interpolate import maybe_interpolate_tree

_META = "meta.json"
_TREE = "tree"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str | Path, tree: Any, *, step: int = 0,
                    args: dict | None = None, extra: dict | None = None) -> None:
    """Save a pytree (params or full TrainState) + metadata. Writes from
    every process (orbax coordinates); metadata from process 0 only
    (reference save_on_master semantics, util/misc.py:207-209)."""
    import shutil

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    tree_path = path / _TREE
    tmp_path = path / (_TREE + ".tmp")
    old_path = path / (_TREE + ".old")
    # Atomic save: write the new tree beside the old one, then swap via
    # renames, so a preemption at ANY point leaves a restorable checkpoint
    # (either `tree` or `tree.old`) — a crash mid-save must not destroy the
    # only checkpoint --resume_auto depends on (reference policy
    # train.py:160-172). All filesystem mutation of the shared directory
    # happens on process 0 only, with barriers around it, so concurrent
    # processes can neither race the stale-tmp cleanup nor start the next
    # save's cleanup while process 0 is still mid-rename.
    def _barrier(name: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"tae_tpu_ckpt_{name}")

    if jax.process_index() == 0 and tmp_path.exists():
        shutil.rmtree(tmp_path)  # partial leftover from an earlier crash
    _barrier("pre_save")
    if jax.process_count() == 1:
        # Fetch the tree to host FIRST, one whole leaf per transfer, and
        # hand orbax host arrays (identical on-disk format). Orbax's own
        # device path streams in small chunks — each a device round-trip —
        # which collapses to ~3 KB/s on a high-latency tunneled TPU link
        # (measured: a 380M-param TrainState save made 3.9 MB of progress
        # in 20 min, while one big device_get runs at ~29 MB/s — RTT-bound
        # vs bandwidth-bound). Harmless on local hardware (one extra host
        # copy). Multi-host keeps orbax's coordinated sharded-save path.
        import os

        if os.environ.get("TAE_TPU_CKPT_HOST_FETCH", "1") != "0":
            tree = jax.tree.map(np.asarray, tree)
    ckptr.save(tmp_path, tree)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        if old_path.exists():
            shutil.rmtree(old_path)
        if tree_path.exists():
            tree_path.rename(old_path)
        tmp_path.rename(tree_path)
        if old_path.exists():
            shutil.rmtree(old_path)
        meta = {"step": int(step), "args": args or {}, **(extra or {})}
        (path / _META).write_text(json.dumps(meta, indent=2, default=str))
    _barrier("post_swap")


def load_checkpoint(path: str | Path, target: Any = None) -> tuple[Any, dict]:
    """Restore (tree, meta). ``target`` (a matching pytree of arrays or
    ShapeDtypeStructs, possibly sharded) restores with correct
    placement/dtypes; without it the stored structure is returned as saved."""
    path = Path(path).absolute()
    ckptr = _checkpointer()
    tree_dir = path / _TREE
    if not tree_dir.exists() and (path / (_TREE + ".old")).exists():
        # crashed between the two swap renames in save_checkpoint: the
        # previous tree was already moved aside but the new one not yet in
        # place — the `.old` tree is the last known-good checkpoint
        tree_dir = path / (_TREE + ".old")
    if target is not None:
        import orbax.checkpoint as ocp

        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        tree = ckptr.restore(tree_dir, abstract)
    else:
        # no target: restore to host memory — callers re-place leaves with
        # their own shardings, and restoring straight onto an accelerator
        # would move every byte twice (painfully slow over a tunneled chip)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            tree = ckptr.restore(tree_dir)
        tree = jax.tree.map(np.asarray, tree)
    meta = {}
    meta_path = path / _META
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    return tree, meta


def promote_checkpoint(src: str | Path, dst: str | Path) -> None:
    """Copy checkpoint dir ``src`` over ``dst`` by LOCAL disk copy + atomic
    swap — no device fetch. Lets a driver save the TrainState once (the
    "latest" preemption checkpoint) and promote it to the best-eval path on
    improvement instead of paying a second device->host transfer, which
    costs minutes for a large TrainState on a tunneled TPU link (see
    save_checkpoint). Same crash policy as save_checkpoint: a preemption at
    any point leaves ``dst`` restorable (new, old, or previous tree).
    Filesystem mutation on process 0 only, with a trailing barrier."""
    import shutil

    src, dst = Path(src).absolute(), Path(dst).absolute()
    if jax.process_index() == 0:
        new_path = dst.parent / (dst.name + ".new")
        old_path = dst.parent / (dst.name + ".promote_old")
        for p in (new_path, old_path):
            if p.exists():
                shutil.rmtree(p)
        shutil.copytree(src, new_path)
        if dst.exists():
            dst.rename(old_path)
        new_path.rename(dst)
        if old_path.exists():
            shutil.rmtree(old_path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tae_tpu_ckpt_promote")


def checkpoint_step(path: str | Path) -> int | None:
    """The saved iteration of a checkpoint dir, or None if absent/invalid.
    Used by --resume_auto to pick the newest of the best/latest pair."""
    meta_path = Path(path) / _META
    if not meta_path.exists():
        return None
    try:
        return int(json.loads(meta_path.read_text()).get("step", 0))
    except (ValueError, OSError, json.JSONDecodeError):
        return None


def _is_torch_checkpoint(path: Path) -> bool:
    return path.is_file() and path.suffix in (".pth", ".pt", ".bin")


def load_params(path: str | Path, model, model_params: Any) -> Any:
    """Load model parameters from either a tae_tpu checkpoint directory or a
    PyTorch reference ``.pth`` file, interpolating pos-embeds on mismatch.

    ``model_params`` provides the target structure (and sharding, if its
    leaves are sharded arrays); missing keys keep their current values —
    the analogue of the reference's ``strict=False`` load
    (util/misc.py:317).
    """
    path = Path(path)
    if _is_torch_checkpoint(path):
        import torch

        from tae_tpu.ckpt import torch_import
        from tae_tpu.models.recognition import RecognitionViT
        from tae_tpu.models.segmentation import SegmentationViT
        from tae_tpu.models.tae import TAE

        ckpt = torch.load(path, weights_only=True, map_location="cpu")
        sd = ckpt.get("model", ckpt)
        if isinstance(model, TAE):
            loaded = torch_import.tae_params_from_torch(sd, model.cfg)
        elif isinstance(model, RecognitionViT):
            loaded = torch_import.recognition_params_from_torch(sd, model.cfg)
        elif isinstance(model, SegmentationViT):
            loaded = torch_import.segmentation_params_from_torch(sd, model.cfg)
        else:
            raise TypeError(f"cannot import torch checkpoint for {type(model)}")
    else:
        loaded, _ = load_checkpoint(path)
        if isinstance(loaded, dict) and "params" in loaded:
            loaded = loaded["params"]

    loaded = maybe_interpolate_tree(loaded, model_params)

    def merge(tgt, src):
        if not isinstance(tgt, dict):
            return np.asarray(src).astype(np.asarray(tgt).dtype) if src is not None else tgt
        return {k: merge(v, src.get(k) if isinstance(src, dict) else None)
                for k, v in tgt.items()}

    merged = merge(model_params, loaded)
    # preserve target sharding/placement if leaves are jax arrays
    return jax.tree.map(
        lambda tgt, new: jax.device_put(new, tgt.sharding)
        if hasattr(tgt, "sharding") else new,
        model_params, merged)


def asdict_args(args) -> dict:
    """argparse Namespace / dataclass -> JSON-serializable dict (checkpoints
    embed the full args like the reference, train.py:166)."""
    if hasattr(args, "__dict__"):
        d = vars(args)
    elif dataclasses.is_dataclass(args):
        d = dataclasses.asdict(args)
    else:
        d = dict(args)
    return {k: v for k, v in d.items() if isinstance(v, (str, int, float, bool, list, tuple, type(None)))}


def load_train_state(path: str | Path, model, model_params: Any,
                     opt_template: Any = None) -> tuple[Any, Any, dict]:
    """Restore (params, opt_state_or_None, meta) from a checkpoint.

    tae_tpu checkpoint dirs saved as ``{"params", "opt"}`` restore the
    optimizer state too (the reference's ``optim_resume=True`` path,
    util/misc.py:319-323, used by the in19k trainer); torch ``.pth`` files
    and params-only trees restore parameters only. A structure mismatch
    (e.g. after a head swap) silently skips the optimizer restore, matching
    the reference's strict=False spirit.
    """
    params = load_params(path, model, model_params)
    path = Path(path)
    if _is_torch_checkpoint(path):
        return params, None, {}
    loaded, meta = load_checkpoint(path)
    opt_state = None
    if opt_template is not None and isinstance(loaded, dict) and "opt" in loaded:
        from tae_tpu.train.optim import AdamWState

        o = loaded["opt"]
        tmpl = opt_template._asdict() if hasattr(opt_template, "_asdict") else opt_template
        def put(t, n):
            n = np.asarray(n).astype(np.asarray(t).dtype)
            # only commit onto explicit mesh shardings; plain arrays stay
            # uncommitted so jit can co-locate them freely
            if hasattr(t, "sharding") and isinstance(
                    t.sharding, jax.sharding.NamedSharding):
                return jax.device_put(n, t.sharding)
            return jnp.asarray(n)

        try:
            restored = jax.tree.map(
                put, tmpl, {"step": o["step"], "mu": o["mu"], "nu": o["nu"]})
            opt_state = AdamWState(**restored)
        except (ValueError, KeyError, TypeError) as e:
            print(f"checkpoint optimizer state skipped ({e})")
    return params, opt_state, meta
