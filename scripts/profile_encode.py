"""On-chip profile of the serving encode path (VERDICT r2 item 2 tooling).

Builds the exact bench.py encode configuration (quantized + unstacked
serving params, pre-patchified input where the bench uses it), traces a few
steady-state iterations with ``jax.profiler``, and prints the
grouped-by-signature device-time table (``utils/xprof.top_op_groups``) plus
a matmul / non-matmul split — the view that found the r2/r3 kernel wins
(docs/KERNELS.md). Batch several configs into ONE process: a fresh client
costs 60-170 s over the relay (CLAUDE.md).

    python scripts/profile_encode.py --configs p64_int8,p16_int8

Reference path being profiled: /root/reference/encode.py:76-91.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from tae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.xla_cache")

# name -> (model, batch, int8, patchin)  — mirrors bench.py ENCODE_CONFIGS
CONFIGS = {
    "p16_bf16": ("tae_patch16_vocab256_px256", 128, False, True),
    "p16_int8": ("tae_patch16_vocab256_px256", 128, True, True),
    "p32_int8": ("tae_patch32_vocab1024_px256", 128, True, True),
    "p64_bf16": ("tae_patch64_vocab4096_px256", 128, False, False),
    "p64_int8": ("tae_patch64_vocab4096_px256", 128, True, True),
    "p128_int8": ("tae_patch128_vocab4096_px256", 256, True, True),
    "p128_bf16": ("tae_patch128_vocab4096_px256", 1024, False, True),
}

MATMUL_MARKERS = ("int8_matmul", "int8_mlp", "fusion.kind=kCustom",
                  "dot(", "dot_general", "convolution", "custom-call")


def build(model_name: str, batch: int, int8: bool, patchin: bool):
    from tae_tpu import models
    from tae_tpu.utils.dtypes import Policy

    model = models.create(model_name)
    params = jax.jit(lambda k: model.init(k, dtype=jnp.bfloat16))(
        jax.random.key(0))
    if int8:
        from tae_tpu.ops.int8 import quantize_params, unstack_blocks

        skip = () if patchin else ("patch_embed",)
        params = jax.jit(lambda p: quantize_params(p, skip=skip))(params)
        params = unstack_blocks(params)
    policy = Policy(param_dtype=jnp.bfloat16)
    c = model.cfg
    shape = ((batch, c.num_patches, 3 * c.patch_size ** 2) if patchin
             else (batch, 3, 256, 256))
    imgs = jax.random.normal(jax.random.key(1), shape, jnp.bfloat16)

    @jax.jit
    def run(params, imgs, k):
        def body(_, carry):
            z = model.forward_encoder(params, carry, policy=policy,
                                      serving=True)
            bump = jnp.sum(z[0, 0, :8]).astype(carry.dtype) * jnp.bfloat16(1e-8)
            return carry + bump

        return jnp.sum(jax.lax.fori_loop(0, k, body, imgs)[0, 0, 0])

    return model, policy, params, imgs, run


def profile_one(name: str, iters: int, limit: int) -> None:
    from tae_tpu.utils.xprof import top_op_groups, trace

    model_name, batch, int8, patchin = CONFIGS[name]
    model, policy, params, imgs, run = build(model_name, batch, int8, patchin)
    t0 = time.perf_counter()
    float(run(params, imgs, jnp.int32(1)))  # compile + warm
    print(f"[{name}] compile+warm {time.perf_counter() - t0:.1f}s",
          flush=True)
    logdir = f"/tmp/xprof_{name}"
    with trace(logdir):
        float(run(params, imgs, jnp.int32(iters)))
    rows = top_op_groups(logdir, limit=limit)
    total = sum(r["total_ms"] for r in rows)
    mm = sum(r["total_ms"] for r in rows
             if any(s in r["name"] for s in MATMUL_MARKERS))
    print(f"\n== {name}  batch {batch}  {iters} iters — device total "
          f"{total:.1f} ms, matmul-ish {mm / total:.1%} ==")
    print(f"{'ms':>9} {'share':>6} {'n':>5}  signature")
    for r in rows:
        print(f"{r['total_ms']:9.3f} {r['share']:6.1%} {r['count']:5d}  "
              f"{r['name'][:120]}")
    del params, imgs
    print(flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="p64_int8,p16_int8")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--limit", type=int, default=30)
    args = p.parse_args()
    for name in args.configs.split(","):
        profile_one(name.strip(), args.iters, args.limit)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
