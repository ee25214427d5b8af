"""Benchmark: encode throughput (images/sec/chip) at 256px.

Measures the frozen-encoder tokenization path on tae_patch64_vocab4096_px256
(BASELINE.json config 3: the encode.py dataset-tokenization run) in bf16 with
device-resident synthetic batches. Prints ONE JSON line; vs_baseline is
relative to the 10k img/s/chip north-star target.

Measurement design for a tunneled chip (host<->device transfers are slow and
async dispatch can't be awaited reliably): all K iterations run inside a
single jitted ``lax.scan`` whose carry feeds each iteration (preventing CSE/
hoisting), the only fetched output is one scalar, and fixed dispatch/fetch
overhead cancels by differencing a long scan against a K=1 scan.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

MODEL = "tae_patch64_vocab4096_px256"
BASELINE_IMG_PER_SEC = 10_000.0
BATCH = 128
K_LONG = 16


def _timed_scan(model, policy, params, imgs, k: int):
    @jax.jit
    def run(params, imgs):
        def body(carry, _):
            z = model.forward_encoder(params, carry, policy=policy)
            # data dependency on the carry so iterations can't be collapsed
            bump = jnp.sum(z[0, 0, :8]).astype(carry.dtype) * jnp.bfloat16(1e-8)
            return carry + bump, ()

        out, _ = jax.lax.scan(body, imgs, None, length=k)
        return jnp.sum(out[0, 0, 0])

    # warmup (compile) then best-of-3 timed, fetching only the scalar
    float(run(params, imgs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, imgs))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from tae_tpu import models
    from tae_tpu.utils.dtypes import Policy

    model = models.create(MODEL)
    params = jax.jit(lambda k: model.init(k, dtype=jnp.bfloat16))(jax.random.key(0))
    policy = Policy(param_dtype=jnp.bfloat16)
    imgs = jax.random.normal(jax.random.key(1), (BATCH, 3, 256, 256), jnp.bfloat16)

    t1 = _timed_scan(model, policy, params, imgs, 1)
    tk = _timed_scan(model, policy, params, imgs, K_LONG)
    per_iter = max(tk - t1, 1e-9) / (K_LONG - 1)
    img_per_sec = BATCH / per_iter

    print(json.dumps({
        "metric": f"images/sec/chip encode px256 ({MODEL}, bf16)",
        "value": round(img_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
