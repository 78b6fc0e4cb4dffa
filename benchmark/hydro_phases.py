"""Phase timing for the hydrostatic step on the current backend.

    python benchmark/hydro_phases.py [nx ny nz] [substeps]

Times each stage of HydrostaticFreeSurfaceModel.step as a separately
jitted function (stage boundaries force materialization, so the sum
exceeds the fused full step — use this for RELATIVE cost ranking)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1440
ny = int(sys.argv[2]) if len(sys.argv) > 2 else 600
nz = int(sys.argv[3]) if len(sys.argv) > 3 else 24
nsub = int(sys.argv[4]) if len(sys.argv) > 4 else 30

from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import (
    SplitExplicitFreeSurface, barotropic_mode, div_xy_2d, fill2d, ETA_LOC)
from clima_oceananigans_jl_tpu.coriolis.coriolis import HydrostaticSphericalCoriolis
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.advection.vector_invariant import VectorInvariant
from clima_oceananigans_jl_tpu.advection.schemes import WENO5
from clima_oceananigans_jl_tpu.timesteppers.steppers import ab2_substep

k = np.arange(nz + 1)
z_faces = -3000.0 * (1.0 - k / nz) ** 1.8
grid = LatitudeLongitudeGrid(size=(nx, ny, nz), longitude=(0, 360),
                             latitude=(-75, 75), z=z_faces, dtype=jnp.float32)
model = HydrostaticFreeSurfaceModel(
    grid, momentum_advection=VectorInvariant(scheme="weno_velocity"),
    tracer_advection=WENO5(), tracers=("T", "S"),
    free_surface=SplitExplicitFreeSurface(substeps=nsub),
    coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
    fused_advection=True)
g = model.grid
key = jax.random.PRNGKey(0); ku, kv = jax.random.split(key)
state = model.initial_state(
    u=0.1 * jax.random.normal(ku, g.shape, jnp.float32),
    v=0.1 * jax.random.normal(kv, g.shape, jnp.float32),
    b=lambda lam, phi, z: 2e-5 * (z + 3000.0) / 3000.0)
jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
dt = jnp.float32(600.0)
fs = model.free_surface


def _sync(out):
    """Force a real device round-trip (block_until_ready does not always
    block under the axon relay)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    _sync(out)
    print(f"{name:28s} {(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms",
          flush=True)
    return out


perm = model._perm
print("state_layout:", model.state_layout, flush=True)
G = bench("tendencies (fused)", model.tendencies, state)
if G["u"].shape != state["solution"]["u"].shape:
    # fused-advance models keep G x/y-interior; pad for the manual
    # XLA-substep stage (the real step never pays this)
    G = {k: jnp.pad(v, model._int_pad()) for k, v in G.items()}
sol = bench("ab2_substep",
            lambda s, G: ab2_substep(s["solution"], G, s["G_prev"] if
                                     s["G_prev"]["u"].shape == G["u"].shape
                                     else {k: jnp.pad(v, model._int_pad())
                                           for k, v in s["G_prev"].items()},
                                     dt, model.ab2_chi, False), state, G)
bench("barotropic_mode x2",
      lambda s: barotropic_mode(g, s["solution"]["u"], s["solution"]["v"],
                                perm=perm),
      state)
U0, V0 = barotropic_mode(g, state["solution"]["u"], state["solution"]["v"],
                         perm=perm)
GU, _ = barotropic_mode(g, G["u"], G["v"], perm=perm)
_, GV = barotropic_mode(g, G["u"], G["v"], perm=perm)
bench(f"split-explicit x{nsub}",
      lambda eta, GU, GV, U0, V0: fs.substep_eta(g, model.eta_bcs, eta,
                                                 GU, GV, U0, V0, dt),
      state["eta"], GU, GV, U0, V0)
bench("corrector",
      lambda s, U, V: fs.corrector(g, s["solution"]["u"],
                                   s["solution"]["v"], U, V, perm=perm),
      state, U0, V0)
bench("fill_all_halos", lambda s: model.fill_all_halos(s["solution"]), state)
bench("compute_w", lambda s: model.compute_w(s["solution"]), state)
bench("update_state", model.update_state, state)
bench("FULL STEP", model.step, state, dt)
