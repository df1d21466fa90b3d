"""Test config.

* Runs on a virtual 8-device CPU mesh so multi-robot sharding paths
  (shard_map over the robot axis) are exercised without TPU hardware.
* Enables the persistent compilation cache: this sandbox compiles XLA
  programs through a remote relay (~0.5 s/program), so caching across test
  runs matters enormously.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force local CPU: the environment defaults JAX_PLATFORMS=axon (remote TPU
# via a relay). Unit tests must run on the local 8-device CPU mesh, never
# claim the TPU. Prefer launching via ./run_tests.sh, which also skips the
# axon PJRT registration entirely (it happens at interpreter startup).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CPU tests get their OWN cache, keyed by the host's CPU feature set and
# compile route (core/backend.cpu_cache_fingerprint): entries AOT-
# compiled elsewhere (the axon relay's compile service) and loaded here
# SIGSEGV inside jax's cache read — that single failure mode broke every
# round-3 full-suite run and one round-4 run before the fingerprinting.
from kimera_multi_tpu.core.backend import configure_compilation_cache  # noqa: E402

configure_compilation_cache()
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
