"""Hardware probe: compile + time the fused hydrostatic tendency kernel
on a lat-lon grid (r4). Usage: python benchmark/probe_fused_hydro.py
[nx ny nz] [mode]; mode: kernel (tendencies only) | step (full model).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 256
nz = int(sys.argv[3]) if len(sys.argv) > 3 else 32
mode = sys.argv[4] if len(sys.argv) > 4 else "kernel"

from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import SplitExplicitFreeSurface
from clima_oceananigans_jl_tpu.coriolis.coriolis import HydrostaticSphericalCoriolis
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.advection.vector_invariant import VectorInvariant
from clima_oceananigans_jl_tpu.advection.schemes import WENO5

k = np.arange(nz + 1)
z_faces = -3000.0 * (1.0 - k / nz) ** 1.8
grid = LatitudeLongitudeGrid(size=(nx, ny, nz), longitude=(0, 360),
                             latitude=(-75, 75), z=z_faces, dtype=jnp.float32)
model = HydrostaticFreeSurfaceModel(
    grid, momentum_advection=VectorInvariant(scheme="weno_velocity"),
    tracer_advection=WENO5(), tracers=("T", "S"),
    free_surface=SplitExplicitFreeSurface(substeps=30),
    coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
    fused_advection=True)
print("fused:", model.fused_advection, "halo:", model.grid.halo, flush=True)
key = jax.random.PRNGKey(0)
ku, kv = jax.random.split(key)
state = model.initial_state(
    u=0.1 * jax.random.normal(ku, model.grid.shape, jnp.float32),
    v=0.1 * jax.random.normal(kv, model.grid.shape, jnp.float32),
    b=lambda lam, phi, z: 2e-5 * (z + 3000.0) / 3000.0)
jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
print("state built", flush=True)

if mode == "kernel":
    from clima_oceananigans_jl_tpu.ops.fused_hydrostatic import (
        fused_hydrostatic_tendencies)
    fn = jax.jit(lambda s: fused_hydrostatic_tendencies(model, s))
else:
    fn = jax.jit(lambda s: model.step(s, jnp.float32(600.0)),
                 donate_argnums=0)

def _sync(out):
    """Force a real device round-trip (block_until_ready does not always
    block under the axon relay)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


t0 = time.perf_counter()
out = fn(state)
_sync(out)
print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)
for leaf in jax.tree_util.tree_leaves(out):
    assert np.isfinite(np.asarray(jnp.max(jnp.abs(leaf)))), "non-finite!"
t0 = time.perf_counter()
reps = 10
for _ in range(reps):
    out = fn(state if mode == "kernel" else out)
_sync(out)
dt = (time.perf_counter() - t0) / reps
pts = nx * ny * nz
print(f"{mode} {nx}x{ny}x{nz}: {dt * 1e3:.2f} ms -> {pts / dt / 1e6:.1f} M pts/s",
      flush=True)
