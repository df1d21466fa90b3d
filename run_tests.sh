#!/bin/bash
# Run the test suite on local CPU (8 virtual devices), bypassing the axon
# TPU registration that otherwise happens at python interpreter startup
# (sitecustomize claims the remote TPU and routes compiles through a slow
# relay — wrong and wasteful for unit tests).
#
# The suite runs as TWO sequential pytest processes. XLA:CPU segfaults in
# backend_compile_and_load after ~130 compiles in one long-lived process
# on this machine class (five round-3/4 full-suite crashes: always the
# same position, a different test each time, every test green in
# isolation, cache on or off). Process-sharding bounds the per-process
# compile count well below the crash horizon; it changes nothing about
# which tests run.
ENV="PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

if [ "$#" -gt 0 ]; then
    # explicit arguments: single process, caller controls the selection
    exec env $ENV python -m pytest "$@"
fi

rc=0
env $ENV python -m pytest tests/test_[a-k]*.py -q || rc=1
env $ENV python -m pytest tests/test_[l-z]*.py -q || rc=1
exit $rc
