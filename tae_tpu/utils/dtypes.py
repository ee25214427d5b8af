"""Mixed-precision policy for TPU.

The reference trains under fp16 autocast with a dynamic-loss-scale GradScaler
(reference train.py:136, util/misc.py:245-271). The TPU-idiomatic equivalent is
bf16 compute with fp32 parameters and fp32 optimizer state — bf16 has the same
exponent range as fp32, so no loss scaling is needed. We keep the policy
explicit and threadable through every apply function instead of relying on an
ambient autocast context.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Controls the dtypes used for parameters, compute, and outputs.

    param_dtype:   dtype parameters are stored in (fp32 master copies).
    compute_dtype: dtype activations/matmuls run in (bf16 on TPU).
    output_dtype:  dtype model outputs are returned in. ``None`` keeps
                   compute_dtype (this mirrors the reference, where autocast
                   leaves the latents in half precision — tests/test_dtype.py).
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype | None = None

    def cast_to_compute(self, tree):
        import jax

        def cast(path, x):
            if not (hasattr(x, "astype")
                    and jnp.issubdtype(x.dtype, jnp.floating)):
                return x
            # int8 per-channel weight scales (tae_tpu.ops.int8 layout) stay
            # fp32: the kernels consume them in fp32, and squeezing them
            # through bf16 here would layer ~0.4% scale-quantization error
            # onto the int8 path for no bandwidth win (they are (out,)-sized)
            if path and getattr(path[-1], "key", None) in ("w_scale",
                                                           "w4_scale"):
                return x
            return x.astype(self.compute_dtype)

        return jax.tree_util.tree_map_with_path(cast, tree)

    def cast_to_output(self, x):
        if self.output_dtype is None:
            return x
        return x.astype(self.output_dtype)


#: bf16 compute / fp32 params — the default training+inference policy on TPU.
DEFAULT = Policy()

#: Full fp32 everywhere — used for CPU tests and torch-parity checks.
FP32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32, output_dtype=jnp.float32)
