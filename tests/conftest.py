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

# CPU tests get their OWN cache: sharing one directory with concurrent
# TPU bench processes produced a one-off SIGSEGV loading an entry mid-
# write, and stale CPU AOT blobs compiled on a different machine carry a
# machine-feature mismatch (cpu_aot_loader warns it "could lead to
# execution errors such as SIGILL")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
