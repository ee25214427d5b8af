"""r3 on-chip experiments: train-step scan partial unroll + p32 q8 probe.

1. p16 train step (fp32 Adam, mb64, remat) with lax.scan partial unroll
   in {1, 2, 4}: the r3 profile put the scan's stacked-grad
   dynamic-update-slice bookkeeping at ~6% of the step; partial unroll
   amortizes it per k layers without the full unroll's HBM blow-up
   (17.1G OOM). Baseline expectation: ~193.6 img/s (CLAUDE.md r3).
2. p32 int8 encode with TAE_TPU_PACKED_ATTN_Q8=1: under the 16M scoped
   limit the q8 scratch pushed p32's MLP blocking down a tier (-8%);
   the 32M limit may have flipped that. Baseline expectation: ~2633.

Run: nohup python scripts/exp_unroll.py > /tmp/exp_unroll.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache("/root/repo/.xla_cache")


def bench_train_unroll(unroll: int, batch: int = 64, steps: int = 8) -> float:
    from tae_tpu import models
    from tae_tpu.train import TrainState, adamw, make_train_step, step_lr

    model = models.create("tae_patch16_vocab256_px256")
    params = jax.jit(model.init)(jax.random.key(0))
    opt = adamw(weight_decay=0.0)
    state = TrainState.create(params, opt)
    loss_fn = lambda p, b: (  # noqa: E731
        model.forward(p, b, remat=True, unroll=unroll)[0], {})
    step = jax.jit(make_train_step(loss_fn, opt, step_lr(1e-4, 1e-5, 450_000)),
                   donate_argnums=0)
    imgs = jax.random.normal(jax.random.key(1), (batch, 3, 256, 256),
                             jnp.float32)

    def run(n, s):
        m = None
        for i in range(n):
            s, m = step(s, imgs, jnp.int32(i))
        float(m["loss"])
        return s

    t0 = time.perf_counter()
    state = run(1, state)  # compile
    print(f"  unroll={unroll} compile {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        state = run(1, state)
        t1 = time.perf_counter()
        state = run(steps + 1, state)
        t2 = time.perf_counter()
        best = min(best, max((t2 - t1) - (t1 - t0), 1e-9) / steps)
    del params, state
    return batch / best


def main() -> None:
    from bench import bench_encode

    print(f"devices: {jax.devices()}", flush=True)

    for unroll in (1, 2, 4):
        rate = bench_train_unroll(unroll)
        print(f"RESULT train_p16_mb64_remat_unroll{unroll}: {rate:.1f} img/s",
              flush=True)

    # p32 int8 encode: q8-out attention probe under the 32M vmem limit.
    # bench_encode's 4th param is the quantization MODE STRING — a stale
    # boolean here once silently ran both probes on the bf16 path (the
    # A/B compared two identical programs; re-measured after the fix)
    p32 = ("tae_patch32_vocab1024_px256", 128, "int8", True)
    rate, _ = bench_encode("exp_p32_int8", *p32)
    print(f"RESULT encode_p32_int8_b128 (q8 default=off): {rate:.1f} img/s",
          flush=True)
    os.environ["TAE_TPU_PACKED_ATTN_Q8"] = "1"
    rate, _ = bench_encode("exp_p32_int8_q8", *p32)
    print(f"RESULT encode_p32_int8_b128 (q8 forced on): {rate:.1f} img/s",
          flush=True)
    del os.environ["TAE_TPU_PACKED_ATTN_Q8"]

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
