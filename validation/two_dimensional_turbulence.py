"""2D turbulence: NonhydrostaticModel, doubly-periodic, WENO5 + RK3
(reference README.md:96-105 canonical example / BASELINE config 1)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from clima_oceananigans_jl_tpu import (
    PERIODIC, FLAT, RectilinearGrid, WENO5, ScalarDiffusivity, Simulation,
    Callback, IterationInterval, partial_x, partial_y, compute,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
grid = RectilinearGrid(size=(n, n, 1), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                       topology=(PERIODIC, PERIODIC, FLAT))
model = NonhydrostaticModel(grid, advection=WENO5(), timestepper="RungeKutta3",
                            closure=ScalarDiffusivity(nu=1e-5))
key = jax.random.PRNGKey(42)
ku, kv = jax.random.split(key)
state = model.initial_state(u=jax.random.normal(ku, grid.shape, model.grid.dtype),
                            v=jax.random.normal(kv, grid.shape, model.grid.dtype))
sim = Simulation(model, state=state, dt=2e-3, stop_iteration=200)

def progress(s):
    fields = s.model.fields(s.state)
    omega = compute(partial_x(fields["v"]) - partial_y(fields["u"]), s.model.grid)
    print(f"it={s.model_iteration():4d} t={s.model_time():.3f} "
          f"max|ζ|={float(jnp.abs(omega.data).max()):.3f}")

sim.callbacks["progress"] = Callback(progress, IterationInterval(50))
sim.run()
print("done: energy",
      float(jnp.mean(sim.state['solution']['u']**2 + sim.state['solution']['v']**2)))
