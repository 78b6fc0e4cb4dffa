#!/bin/sh
# Fast CPU test runs: skip the axon PJRT registration (which dials the TPU
# relay at interpreter start and can block for minutes) and force the CPU
# backend with a virtual 8-device mesh (see tests/conftest.py).
#
# Two tiers, mirroring the reference's Float64+Float32 matrix
# (test/dependencies_for_runtests.jl:55):
#   tests/      f64 (x64 enabled)   - the main suite
#   tests_f32/  f32 (x64 disabled)  - benchmark-dtype correctness
set -e
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests_f32/ -q "$@"
