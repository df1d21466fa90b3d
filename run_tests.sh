#!/bin/bash
# Run the test suite on local CPU (8 virtual devices), bypassing the axon
# TPU registration that otherwise happens at python interpreter startup
# (sitecustomize claims the remote TPU and routes compiles through a slow
# relay — wrong and wasteful for unit tests).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
