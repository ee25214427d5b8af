"""Small-batch serving latency probe: int8 vs int4 encode, b1/b8.

Measures the weight-streaming-bound regime the int4 path exists for
(docs/KERNELS.md "int4 serving weights"): per-batch encode latency of the
frozen encoder in the unstacked serving layout, for batch sizes where the
weight DMA dominates. Timing follows bench.py's relay-safe design — all K
iterations inside one jitted fori_loop with a data-dependent carry, one
fetched scalar, K-vs-1 differencing, best-of-3 — with K=48 (K=12 has been
observed to read physically impossible numbers over the relay; CLAUDE.md).

Usage: python scripts/serve_latency.py [--model tae_patch64_vocab4096_px256]
       [--batches 1,8] [--modes int8,int4] [--k 48]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from tae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.xla_cache")


def measure(model_name: str, batch: int, quant: str, k: int) -> float:
    """Returns ms/batch for one encode of ``batch`` pre-patchified images."""
    from tae_tpu import models
    from tae_tpu.ops.int8 import prepare_serving_params
    from tae_tpu.tokenizer import prune_component
    from tae_tpu.utils.dtypes import Policy

    model = models.create(model_name)
    params = jax.jit(lambda key: model.init(key, dtype=jnp.bfloat16))(
        jax.random.key(0))
    params = prune_component(params, "encoder")
    if quant != "bf16":
        params = prepare_serving_params(params, quant, patch_input=True)
    policy = Policy(param_dtype=jnp.bfloat16)
    c = model.cfg
    imgs = jax.random.normal(jax.random.key(1),
                             (batch, c.num_patches, 3 * c.patch_size ** 2),
                             jnp.bfloat16)

    @jax.jit
    def run(params, imgs, kk):
        def body(_, carry):
            z = model.forward_encoder(params, carry, policy=policy,
                                      serving=True)
            bump = jnp.sum(z[0, 0, :8]).astype(carry.dtype) * jnp.bfloat16(1e-8)
            return carry + bump

        out = jax.lax.fori_loop(0, kk, body, imgs)
        return jnp.sum(out[0, 0, 0])

    float(run(params, imgs, jnp.int32(1)))  # compile (kk is traced)

    def timed(kk: int) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, imgs, jnp.int32(kk)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(1), timed(k)
    return max(tk - t1, 1e-9) / (k - 1) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tae_patch64_vocab4096_px256")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--modes", default="int8,int4")
    ap.add_argument("--k", type=int, default=48)
    args = ap.parse_args()

    out: dict[str, float] = {}
    for mode in args.modes.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            ms = measure(args.model, b, mode, args.k)
            out[f"{mode}_b{b}"] = round(ms, 3)
            print(f"# {args.model} {mode} b{b}: {ms:.3f} ms/batch "
                  f"({b / ms * 1e3:.0f} img/s)", flush=True)
    print(json.dumps({"model": args.model, "ms_per_batch": out}))


if __name__ == "__main__":
    main()
