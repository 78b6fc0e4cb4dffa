"""Shallow-water Bickley jet instability growth
(reference validation/bickley_jet + shallow_water regression)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from clima_oceananigans_jl_tpu import (
    PERIODIC, BOUNDED, FLAT, RectilinearGrid, WENO5, Simulation, Callback,
    IterationInterval,
)
from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
grid = RectilinearGrid(size=(n, n, 1), x=(0, 4 * np.pi), y=(-10, 10),
                       topology=(PERIODIC, BOUNDED, FLAT), dtype=jnp.float64)
model = ShallowWaterModel(grid=grid, gravitational_acceleration=10.0,
                          advection=WENO5())

def uh0(x, y, z):
    U = 1.0 / jnp.cosh(y) ** 2
    perturb = 1e-4 * jnp.exp(-y * y) * jnp.cos(2.0 * x)
    return U + perturb

state = model.initial_state(uh=uh0, h=1.0)
sim = Simulation(model, state=state, dt=1e-3, stop_iteration=2000)
growth = []

def track(s):
    vh = s.state["solution"]["vh"]
    v_norm = float(jnp.sqrt(jnp.mean(vh ** 2)))
    growth.append((s.model_time(), v_norm))
    print(f"it={s.model_iteration():5d} t={s.model_time():.3f} |vh|={v_norm:.3e}")

sim.callbacks["track"] = Callback(track, IterationInterval(200))
sim.run()
# measured instability growth rate over the linear phase
ts = np.array([t for t, _ in growth[1:]])
vs = np.array([v for _, v in growth[1:]])
rate = np.polyfit(ts, np.log(vs), 1)[0]
print(f"measured growth rate: {rate:.4f} (expected O(0.1) for the Bickley jet)")
