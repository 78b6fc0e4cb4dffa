"""Shallow-water Bickley jet instability.

Mirror of /root/reference/examples/shallow_water_Bickley_jet.jl: a
rotating (f = 1) shallow-water layer (g = 1, depth 10) with a
geostrophically balanced Bickley jet u = sech^2(y), free surface
deformation h = Lz - (fU/g) tanh(y), seeded with a small perturbation.
The jet is barotropically unstable; the meridional transport vh grows
exponentially.

Self-check: the growth of |vh| is (i) exponential (clean log-linear fit)
with (ii) a growth rate in the known band for the Bickley jet at these
parameters (sigma ~ 0.1-0.2 in units of U/L).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, Callback, FPlane, IterationInterval,
    RectilinearGrid, Simulation, WENO5,
)
from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel

Lx, Ly, Lz = 2 * np.pi, 20.0, 10.0
Nx, Ny = 128, 128
grid = RectilinearGrid(size=(Nx, Ny, 1), x=(0, Lx), y=(-Ly / 2, Ly / 2),
                       topology=(PERIODIC, BOUNDED, FLAT),
                       dtype=jnp.float64)

gravity, f, U = 1.0, 1.0, 1.0
model = ShallowWaterModel(grid=grid, gravitational_acceleration=gravity,
                          coriolis=FPlane(f=f), advection=WENO5())

d_eta = f * U / gravity  # geostrophic free-surface deformation
hbar = lambda x, y, z: Lz - d_eta * jnp.tanh(y)
ubar = lambda x, y, z: U / jnp.cosh(y)**2

key = jax.random.PRNGKey(5)
g = model.grid
yc = g.nodes(("f", "c", "c"), with_halo=False)[1]
noise = jax.random.normal(key, g.shape, g.dtype)
uh0 = (ubar(0, yc, 0) + 1e-4 * jnp.exp(-yc**2) * noise) * hbar(0, yc, 0)
state = model.initial_state(uh=uh0, h=hbar)

sim = Simulation(model, state=state, dt=1e-2, stop_time=0.0)
history = []


def vh_norm(s):
    return float(jnp.sqrt(jnp.mean(g.interior(s["solution"]["vh"])**2)))


# measure inside the linear phase (the mode saturates around t ~ 95 at
# this seed amplitude)
for stop in np.arange(20.0, 81.0, 15.0):
    sim.stop_time = float(stop)
    sim.running = True
    sim.run()
    history.append((sim.model_time(), vh_norm(sim.state)))
    print(f"t = {history[-1][0]:6.1f}  |vh| = {history[-1][1]:.3e}")

ts = np.array([t for t, _ in history[1:]])
vs = np.log([v for _, v in history[1:]])
sigma, b0 = np.polyfit(ts, vs, 1)
resid = vs - (sigma * ts + b0)
r2 = 1 - resid.var() / vs.var()
print(f"growth rate sigma = {sigma:.4f} (Bickley jet: ~0.1-0.2), "
      f"log-linear R^2 = {r2:.4f}")
assert 0.05 < sigma < 0.4, sigma
assert r2 > 0.99, r2
print("shallow_water_bickley_jet: PASS")
