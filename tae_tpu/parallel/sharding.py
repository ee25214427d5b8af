"""Sharding rules: param pytree -> NamedSharding per leaf.

Rules are path-based (leaf names are stable across all three model families
since they share the ViT primitives):

  * attention qkv / MLP fc1 weights  — output-dim over ``tensor`` (column
    parallel), input-dim over ``fsdp``;
  * attention proj / MLP fc2 weights — input-dim over ``tensor`` (row
    parallel; XLA inserts the psum), output-dim over ``fsdp``;
  * their biases follow the output dim;
  * dense-prediction / classifier heads (``head``, ``aux_head``) —
    ``fsdp`` on the input dim, output dim replicated (ZeRO-style weight
    gather; keeps activations batch-sharded through dim-mixing reshapes,
    see the rule comment below);
  * embeddings / norms / everything else — replicated over ``tensor``,
    largest dim over ``fsdp`` when divisible.

Depth-stacked block leaves carry a leading (depth,) axis which is never
sharded. Any axis whose size does not divide the mesh axis falls back to
replication (important for the vocab-16 bottleneck projections).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any

# suffix -> spec for the *trailing* dims (leading depth axis handled below).
# int8-quantized leaves (w_q + per-output-channel w_scale, see
# tae_tpu.ops.int8.quantize_params) mirror their float counterparts; the
# scale vector follows the weight's output-dim sharding, like the bias.
_RULES: list[tuple[tuple[str, ...], tuple[str | None, ...]]] = [
    (("attn", "qkv", "w"), ("fsdp", "tensor")),
    (("attn", "qkv", "w_q"), ("fsdp", "tensor")),
    (("attn", "qkv", "w_scale"), ("tensor",)),
    (("attn", "qkv", "b"), ("tensor",)),
    (("attn", "proj", "w"), ("tensor", "fsdp")),
    (("attn", "proj", "w_q"), ("tensor", "fsdp")),
    (("attn", "proj", "w_scale"), (None,)),
    (("attn", "proj", "b"), (None,)),
    (("mlp", "fc1", "w"), ("fsdp", "tensor")),
    (("mlp", "fc1", "w_q"), ("fsdp", "tensor")),
    (("mlp", "fc1", "w_scale"), ("tensor",)),
    (("mlp", "fc1", "b"), ("tensor",)),
    (("mlp", "fc2", "w"), ("tensor", "fsdp")),
    (("mlp", "fc2", "w_q"), ("tensor", "fsdp")),
    (("mlp", "fc2", "w_scale"), (None,)),
    (("mlp", "fc2", "b"), (None,)),
    # Dense-prediction / classifier heads ("head", "aux_head" — the
    # segmentation and recognition output layers): fsdp on the INPUT dim,
    # output dim replicated. The default rule put fsdp on the head's
    # (larger) output dim, which made the backward of ``out = x @ W``
    # prefer a channel-sharded ``dout`` — conflicting with the batch-only
    # activation sharding on both sides of the segmenter's dim-mixing
    # unpatchify, which GSPMD resolved with an involuntary full
    # rematerialization (all-gather + re-slice of the activation per step;
    # spmd_partitioner warnings in the r3/r4 dryruns). Input-dim sharding
    # measures ZERO such warnings (tests/test_train.py pins it with a
    # positive control): GSPMD resolves it ZeRO-style — gather the weight
    # shards for the matmul, reduce-scatter dW — so activations stay
    # batch-sharded and the per-step communication is weights/grads only,
    # matching the reference's DDP semantics (bucketed grads, reference
    # train.py:102), while the Adam state still shards ``1/fsdp`` (the
    # numpatches16/4 segmentation heads are 66M/264M params — replication
    # would cost up to ~4 GB/device of optimizer state at patch 128).
    (("head", "w"), ("fsdp", None)),
    (("head", "w_q"), ("fsdp", None)),
    (("head", "w_scale"), (None,)),
    (("aux_head", "w"), ("fsdp", None)),
    (("aux_head", "w_q"), ("fsdp", None)),
    (("aux_head", "w_scale"), (None,)),
]


def _path_names(path) -> tuple[str, ...]:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        else:
            names.append(str(entry))
    return tuple(names)


def _axis_ok(mesh: Mesh, axis: str | None, dim: int) -> bool:
    return axis is None or dim % mesh.shape[axis] == 0


def _spec_for(names: tuple[str, ...], leaf, mesh: Mesh) -> P:
    ndim = leaf.ndim
    for suffix, trailing in _RULES:
        if names[-len(suffix):] == suffix:
            lead = ndim - len(trailing)
            spec = [None] * lead + [
                ax if _axis_ok(mesh, ax, leaf.shape[lead + i]) else None
                for i, ax in enumerate(trailing)
            ]
            return P(*spec)
    # default: replicate over tensor; put the largest divisible dim on fsdp
    if ndim >= 2 and mesh.shape["fsdp"] > 1:
        # skip a leading stacked-depth/broadcast axis of size 1
        dims = sorted(range(ndim), key=lambda i: -leaf.shape[i])
        for d in dims:
            if leaf.shape[d] > 1 and leaf.shape[d] % mesh.shape["fsdp"] == 0:
                spec = [None] * ndim
                spec[d] = "fsdp"
                return P(*spec)
    return P()


def param_shardings(params: Params, mesh: Mesh) -> Params:
    """NamedSharding pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(_path_names(path), leaf, mesh)),
        params,
    )


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place a host-resident param tree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch (leading) axis sharded over (data, fsdp) — fsdp behaves like
    extra data parallelism for activations, as in standard ZeRO. Trailing
    dims are left unspecified so the same sharding fits any input rank
    (images, pre-patchified batches, latents, labels)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x, mesh: Mesh | None):
    """Pin an activation to batch-only sharding (leading dim over
    (data, fsdp), everything else replicated) inside a jitted program.

    GSPMD propagates shardings through elementwise/matmul ops well, but
    dim-mixing reshapes (unpatchify and its transpose in the backward) can
    end up with conflicting source/target shardings, which the partitioner
    resolves by an "involuntary full rematerialization" — a full all-gather
    + re-slice per step (observed on the segmentation train step's jvp
    transpose, spmd_partitioner.cc:652). Constraining both sides of the
    reshape to the batch sharding keeps the backward collective-free, like
    the reference's DDP which only communicates bucketed gradients
    (reference train.py:102).

    No-op when ``mesh`` is None or single-device, so unsharded callers
    (tests, single-chip serving) are unaffected.
    """
    if mesh is None or mesh.devices.size == 1:
        return x
    spec = P(("data", "fsdp"), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
