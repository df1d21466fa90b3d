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

# The persistent compilation cache is DISABLED for tests. Every round-3
# and round-4 full-suite crash (3x SIGSEGV, 2x SIGABRT) happened inside
# jax's cache READ (`compilation_cache.py:238 get_executable_and_time`)
# ~130 tests in — including with a completely fresh directory, a
# machine-fingerprinted directory (core/backend.cpu_cache_fingerprint),
# and no concurrent writers, so the deserializer itself is unsafe for
# some executable this suite produces on this machine. Compiles are
# LOCAL under run_tests.sh (PALLAS_AXON_POOL_IPS cleared), so the cost
# of recompiling is bounded and the suite completes deterministically.
# Production entry points (cli/*, bench.py) keep their caches via
# core/backend.configure_compilation_cache — the TPU-side cache has
# never crashed. Tests that drive cli.run IN-PROCESS would re-enable it
# for the whole pytest process, so the kill-switch below makes
# configure_compilation_cache a no-op under tests (and in the forked
# e2e subprocesses, which inherit the environment).
os.environ["KMT_DISABLE_COMPILE_CACHE"] = "1"
