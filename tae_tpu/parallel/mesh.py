"""Device-mesh construction for SPMD training.

The reference's parallelism story is DDP over NCCL plus a manual 2-GPU
pipeline (SURVEY.md §2.2). The TPU-native design replaces all of it with one
abstraction: a named ``jax.sharding.Mesh`` with axes

  * ``data``   — pure data parallelism (gradient psum over ICI),
  * ``fsdp``   — parameter/optimizer sharding (ZeRO-style; the reference's
                 "TODO: try FSDP", train.py:102),
  * ``tensor`` — Megatron-style tensor parallelism inside attention/MLP.

Collectives are inserted by XLA from sharding annotations (GSPMD); nothing in
the framework issues explicit communication for the standard paths.

Multi-host: call :func:`initialize_distributed` first (the TPU equivalent of
the reference's NCCL process-group init, util/misc.py:212-242); the mesh then
spans all hosts' devices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tensor")


def make_mesh(data: int = -1, fsdp: int = 1, tensor: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "fsdp", "tensor") mesh.

    ``data=-1`` absorbs all remaining devices. Axis sizes must multiply to
    the device count. Device order follows ``jax.devices()``, which on TPU
    pods is ICI-contiguous — keeping tensor/fsdp (the chatty axes) innermost
    puts their collectives on the shortest rings.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        if n % (fsdp * tensor):
            raise ValueError(f"{n} devices not divisible by fsdp*tensor={fsdp * tensor}")
        data = n // (fsdp * tensor)
    if data * fsdp * tensor != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{tensor} != {n} devices")
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, AXES)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host rendezvous over DCN — TPU-native replacement for
    ``dist.init_process_group("nccl")`` (reference util/misc.py:238). On TPU
    pods all arguments auto-detect from the environment."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    """Rank-0 gating for checkpoint writes and logging
    (reference util/misc.py:203-209)."""
    return jax.process_index() == 0
