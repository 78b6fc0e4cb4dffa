"""Headline benchmark: 256^3 nonhydrostatic WENO5 step, grid-points/s/chip.

Mirrors the reference's flagship benchmark (Oceananigans
benchmark/benchmark_nonhydrostatic_models.jl; published numbers in
docs/src/appendix/benchmarks.md:120-142 — V100 FP64 56.4 ms/step at 256^3
(~298 M pts/s), FP32 38.8 ms (~432 M pts/s)). Same configuration: WENO5
momentum advection, one active tracer, quasi-AB2 time stepping (one
tendency evaluation + one FFT projection per step), FP32; compared
against the reference's FP32 anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

REFERENCE_PTS_PER_S = 432e6  # V100 FP32, docs/src/appendix/benchmarks.md:124

N = 256
STEPS = 20


def main():
    grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float32)
    model = NonhydrostaticModel(grid, advection=WENO5(),
                                buoyancy=BuoyancyTracer(),
                                timestepper="QuasiAdamsBashforth2")
    key = jax.random.PRNGKey(0)
    ku, kv, kb = jax.random.split(key, 3)
    state = model.initial_state(
        u=1e-2 * jax.random.normal(ku, grid.shape, grid.dtype),
        v=1e-2 * jax.random.normal(kv, grid.shape, grid.dtype),
        b=1e-4 * jax.random.normal(kb, grid.shape, grid.dtype),
    )
    dt = jnp.asarray(1e-4, grid.dtype)

    step = jax.jit(model.step, donate_argnums=0)

    state = step(state, dt)  # compile + warmup
    state = step(state, dt)
    # explicit value fetch: under the axon relay block_until_ready does not
    # always block, so sync with a real device round-trip
    float(state["solution"]["u"][N // 2, N // 2, N // 2])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state = step(state, dt)
    float(state["solution"]["u"][N // 2, N // 2, N // 2])
    elapsed = time.perf_counter() - t0

    per_step = elapsed / STEPS
    pts_per_s = N ** 3 / per_step
    print(json.dumps({
        "metric": "grid-points/s/chip (256^3 nonhydrostatic WENO5 AB2, fp32)",
        "value": round(pts_per_s),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / REFERENCE_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
