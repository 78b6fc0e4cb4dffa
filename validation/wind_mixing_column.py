"""Stretched-z wind-driven mixing column: CATKE + implicit vertical
diffusion (reference ocean_wind_mixing_and_convection example /
BASELINE config 4)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from clima_oceananigans_jl_tpu import (
    FLAT, BOUNDED, RectilinearGrid, Simulation, Callback, IterationInterval,
    FieldBCs, FluxBC,
)
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import ImplicitFreeSurface
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.closures.vertical_mixing import CATKEVerticalDiffusivity

nz = int(sys.argv[1]) if len(sys.argv) > 1 else 48
# stretched z: fine near the surface
k = np.arange(nz + 1)
z_faces = -100.0 * (1 - (k / nz)) ** 1.5
grid = RectilinearGrid(size=(1, 1, nz), x=(0, 1), y=(0, 1), z=z_faces,
                       topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
wind_stress = -1e-4  # kinematic, m^2/s^2
model = HydrostaticFreeSurfaceModel(
    grid=grid, free_surface=ImplicitFreeSurface(solver_method="pcg"),
    momentum_advection=None, tracer_advection=None,
    buoyancy=BuoyancyTracer(),
    closure=CATKEVerticalDiffusivity(
        surface_momentum_flux=(wind_stress, 0.0)),
    boundary_conditions={"u": FieldBCs(top=FluxBC(wind_stress))})
state = model.initial_state(b=lambda x, y, z: 1e-5 * (z + 100.0) / 100.0, e=1e-7)
sim = Simulation(model, state=state, dt=60.0, stop_iteration=240)

def progress(s):
    sol = s.state["solution"]
    mld_idx = np.argmax(np.asarray(s.model.grid.interior(sol["e"]))[0, 0] > 1e-6)
    print(f"it={s.model_iteration():4d} t={s.model_time()/3600:.2f}h "
          f"max u={float(sol['u'].max()):.4f} max e={float(sol['e'].max()):.2e}")

sim.callbacks["progress"] = Callback(progress, IterationInterval(60))
sim.run()
print("final TKE profile (top 5):",
      np.asarray(model.grid.interior(sim.state['solution']['e']))[0, 0, -5:])
