"""Near-global lat-lon hydrostatic ocean: split-explicit free surface,
wind stress, spherical Coriolis (reference validation/near_global_lat_lon,
the flagship configuration / BASELINE config 5)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from clima_oceananigans_jl_tpu import (
    Simulation, Callback, IterationInterval, ScalarDiffusivity, FieldBCs, FluxBC,
)
from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import SplitExplicitFreeSurface
from clima_oceananigans_jl_tpu.coriolis.coriolis import HydrostaticSphericalCoriolis
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer

deg = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0   # resolution in degrees
nx, ny, nz = int(360 / deg), int(150 / deg), 12
grid = LatitudeLongitudeGrid(size=(nx, ny, nz), longitude=(0, 360),
                             latitude=(-75, 75), z=(-3000.0, 0.0))

def wind_stress(lam, phi, t):
    # idealized zonal wind: easterlies in the tropics, westerlies mid-lat
    return -1e-4 * jnp.cos(3.0 * jnp.pi * phi / 180.0)

model = HydrostaticFreeSurfaceModel(
    grid=grid,
    free_surface=SplitExplicitFreeSurface(substeps=50),
    coriolis=HydrostaticSphericalCoriolis(),
    buoyancy=BuoyancyTracer(),
    closure=ScalarDiffusivity(nu=1e4, kappa=1e3, nu_z=1e-3, kappa_z=1e-4,
                              time_discretization="vertically_implicit"),
    boundary_conditions={"u": FieldBCs(top=FluxBC(wind_stress))})
state = model.initial_state(
    b=lambda lam, phi, z: 2e-5 * (z + 3000.0) / 3000.0
    + 1e-6 * jnp.cos(jnp.pi * phi / 180.0))
sim = Simulation(model, state=state, dt=1200.0, stop_iteration=72)  # 1 day

def progress(s):
    sol = s.state["solution"]
    print(f"it={s.model_iteration():4d} t={s.model_time()/3600:6.1f}h "
          f"max|u|={float(jnp.abs(sol['u']).max()):.4f} "
          f"max|eta|={float(jnp.abs(s.state['eta']).max()):.4f}")

sim.callbacks["progress"] = Callback(progress, IterationInterval(12))
sim.run()
print("near-global day-1 spinup complete; max|u| =",
      float(jnp.abs(sim.state['solution']['u']).max()))
