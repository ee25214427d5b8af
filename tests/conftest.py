"""Test environment: force an 8-device virtual CPU platform before JAX loads.

This is the TPU-world equivalent of a fake backend (SURVEY.md §4): multi-chip
sharding logic runs on 8 virtual CPU devices so distributed correctness is
actually exercised, not taken on faith.
"""

import os

# Force the CPU platform even when a TPU plugin environment is active. Env
# vars alone are not enough: a TPU plugin registered from sitecustomize may
# force-select its platform via jax.config at interpreter start, so we also
# update the config back after importing jax below.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU devices"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
# Keep the persistent XLA compilation cache OFF in tests even if a module
# import enables it (bench.py does at import time, so test_bench_utils
# would otherwise switch it on for the whole process): cached compiles
# skip the SPMD partitioner, silently defeating tests that assert on
# partitioner behavior (the seg full-remat warning capture self-skipped
# this way in the r5 full-suite run).
jax.config.update("jax_enable_compilation_cache", False)
# Tests run on CPU: use the XLA attention path by default; Pallas kernels are
# tested explicitly in interpret mode.
os.environ.setdefault("TAE_TPU_ATTN", "xla")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
