#!/bin/sh
# Fast CPU test runs: skip the axon PJRT registration (which dials the TPU
# relay at interpreter start and can block for minutes) and force the CPU
# backend with a virtual 8-device mesh (see tests/conftest.py).
#
# Three tiers, mirroring the reference's Float64+Float32 matrix
# (test/dependencies_for_runtests.jl:55) plus its example smoke tests
# (test/test_validation.jl):
#   tests/      f64 (x64 enabled)   - the main suite
#   tests_f32/  f32 (x64 disabled)  - benchmark-dtype correctness
#   smoke       all 11 self-checking examples + 3 cheap validation cases
#               (~3 min; CLIMA_SKIP_SMOKE=1 skips, e.g. for fast loops)
set -e
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests_f32/ -q "$@"
if [ -z "$CLIMA_SKIP_SMOKE" ]; then
    ./examples/run_all.sh > /dev/null
    echo "examples: ALL PASS"
    for f in thermal_bubble curvilinear_diffusion wind_mixing_column; do
        PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 \
            python "validation/$f.py" > /dev/null
        echo "validation/$f: PASS"
    done
fi
