#!/bin/sh
# Fast CPU test runs: skip the axon PJRT registration (which dials the TPU
# relay at interpreter start and can block for minutes) and force the CPU
# backend with a virtual 8-device mesh (see tests/conftest.py).
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
