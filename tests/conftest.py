"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that the multi-chip sharding
paths (`shard_map` over a Mesh) are exercised without TPU hardware — the
strategy recommended in SURVEY.md §4 (the reference's CPU-vs-GPU
differential-testing pattern generalized to a fake device mesh).
"""

import os

# Hard-set: the ambient environment exports JAX_PLATFORMS=axon (TPU tunnel)
# and a sitecustomize imports jax at interpreter startup, so the env var is
# already frozen into jax.config — override via config.update instead.
# Unit tests must run on local CPU (the TPU chip is reserved for bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import madnlp_tpu  # noqa: E402,F401  (enables x64)
