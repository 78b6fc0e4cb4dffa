"""Reference-parity benchmark table, measured on the current backend in
ONE long-lived process (the axon relay wedges when TPU processes churn).

    python benchmark/bench_parity_table.py [quick]

Covers the reference's published anchor configurations
(/root/reference/docs/src/appendix/benchmarks.md):
  - nonhydrostatic 256³ WENO5 AB2 (benchmarks.md:124-128),
  - tracer scaling 0/1/2/6/10 extra passive tracers (benchmarks.md:547-562),
  - shallow water 8192² and 16384² (benchmarks.md:58),
  - hydrostatic quarter-degree lat-lon (near-global scale, split-explicit).
Prints one table row per config; paste into benchmark/RESULTS.md.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
REPS = 3 if quick else 10

from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def run_steps(model, state, dt, reps=REPS):
    from clima_oceananigans_jl_tpu.models.compile import compile_step
    step, state = compile_step(model, state, dt, donate=True)
    t0 = time.perf_counter()
    state = step(state, dt)
    _sync(state)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state, dt)
    _sync(state)
    ms = (time.perf_counter() - t0) / reps * 1e3
    return ms, compile_s


def row(name, npts, ms, note=""):
    print(f"| {name} | {ms:.1f} ms | {npts / ms * 1e3 / 1e6:.0f} M pts/s "
          f"| {note} |", flush=True)


print("| config | time/step | throughput | reference anchor |", flush=True)
print("|---|---|---|---|", flush=True)

# -- nonhydrostatic 256³ + tracer scaling -------------------------------
n = 128 if quick else 256
for ntr in (0, 1, 2, 6, 10):
    grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float32)
    tracers = tuple(f"c{i}" for i in range(ntr))
    model = NonhydrostaticModel(grid, advection=WENO5(),
                                buoyancy=BuoyancyTracer(), tracers=tracers)
    state = model.initial_state(u=1e-2 * jax.random.normal(
        jax.random.PRNGKey(0), grid.shape, jnp.float32))
    ms, cs = run_steps(model, state, jnp.float32(1e-4))
    fused = "fused" if model.fused_step else "split"
    row(f"nonhydrostatic {n}³ WENO5 AB2, b + {ntr} passive tracers",
        n ** 3, ms, f"{fused}; V100 fp32 38.8 ms @256³ (0 passive); "
        "0→10 passive: 12.8→27.2 ms @~128³ (benchmarks.md:555)")
    del model, state

# -- shallow water -------------------------------------------------------
from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
for nsw in ((4096,) if quick else (8192, 16384)):
    grid = RectilinearGrid(size=(nsw, nsw, 1), extent=(1e6, 1e6),
                           topology=(PERIODIC, PERIODIC, "flat"),
                           dtype=jnp.float32)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=9.81,
                              advection=WENO5())
    state = model.initial_state(
        uh=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x / 1e6),
        h=1000.0)
    ms, cs = run_steps(model, state, jnp.float32(1.0))
    row(f"shallow water {nsw}² WENO5 RK3", nsw * nsw, ms,
        "V100 fp64 681 ms @16384² (benchmarks.md:58)")
    del model, state

# -- hydrostatic quarter-degree lat-lon ---------------------------------
from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import (
    HydrostaticFreeSurfaceModel)
from clima_oceananigans_jl_tpu.models.free_surface import (
    SplitExplicitFreeSurface)
from clima_oceananigans_jl_tpu.coriolis.coriolis import (
    HydrostaticSphericalCoriolis)
from clima_oceananigans_jl_tpu.advection.vector_invariant import (
    VectorInvariant)

deg = 1.0 if quick else 0.25
nx, ny, nz = int(360 / deg), int(150 / deg), 24
k = np.arange(nz + 1)
zf = -3000.0 * (1.0 - k / nz) ** 1.8
grid = LatitudeLongitudeGrid(size=(nx, ny, nz), longitude=(0, 360),
                             latitude=(-75, 75), z=zf, dtype=jnp.float32)
model = HydrostaticFreeSurfaceModel(
    grid, momentum_advection=VectorInvariant(scheme="weno_velocity"),
    tracer_advection=WENO5(), tracers=("T", "S"),
    free_surface=SplitExplicitFreeSurface(substeps=30),
    coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
    fused_advection=True)
state = model.initial_state(
    u=0.1 * jax.random.normal(jax.random.PRNGKey(0), model.grid.shape,
                              jnp.float32),
    b=lambda lam, phi, z: 2e-5 * (z + 3000.0) / 3000.0)
ms, cs = run_steps(model, state, jnp.float32(600.0))
row(f"hydrostatic lat-lon {deg}° ({nx}×{ny}×{nz}), weno-VI + 2 WENO "
    f"tracers, split-explicit(30)", nx * ny * nz, ms,
    "the reference's near-global flagship config family")
