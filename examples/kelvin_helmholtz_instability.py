"""Kelvin-Helmholtz instability of a stratified shear layer.

Mirror of /root/reference/examples/kelvin_helmholtz_instability.jl: 2D
(x, z) domain with background shear U(z) = tanh(z) and stratification
B(z) = Ri h tanh(z/h) (Ri = 0.1, h = 1/4) via BackgroundFields; the
perturbation kinetic energy of a random seed grows exponentially at the
instability's growth rate.

Self-check: the measured growth rate sigma (from the log-slope of the
perturbation energy after an initial adjustment) is positive and of the
right magnitude. For tanh shear at Ri = 0.1 the fastest-growing KH mode
has sigma ~ 0.1-0.2 (in units of the shear rate); we assert
0.05 < sigma < 0.35.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, BackgroundField, RectilinearGrid,
    ScalarDiffusivity, Simulation, UpwindBiasedFifthOrder,
)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

grid = RectilinearGrid(size=(64, 1, 64), x=(-5, 5), y=(0, 1), z=(-5, 5),
                       topology=(PERIODIC, FLAT, BOUNDED),
                       dtype=jnp.float64)

Ri, h = 0.1, 1 / 4
U = BackgroundField(lambda x, y, z, t: jnp.tanh(z))
B = BackgroundField(lambda x, y, z, t, p: p["h"] * p["Ri"] * jnp.tanh(z / p["h"]),
                    parameters={"Ri": Ri, "h": h})

model = NonhydrostaticModel(grid, timestepper="RungeKutta3",
                            advection=UpwindBiasedFifthOrder(),
                            background_fields={"u": U, "b": B},
                            closure=ScalarDiffusivity(nu=2e-4, kappa=2e-4),
                            buoyancy=BuoyancyTracer())

key = jax.random.PRNGKey(42)
ku, kw = jax.random.split(key)
noise_u = 1e-6 * jax.random.normal(ku, model.grid.shape, model.grid.dtype)
noise_w = 1e-6 * jax.random.normal(kw, model.grid.shape, model.grid.dtype)
state = model.initial_state(u=noise_u, w=noise_w)


def perturbation_energy(s):
    g = model.grid
    return sum(0.5 * float(jnp.sum(g.interior(s["solution"][n])**2))
               for n in ("u", "w"))


sim = Simulation(model, state=state, dt=0.1, stop_iteration=1)
times, energies = [], []
# let the random seed project onto the unstable mode, then measure the
# exponential growth E ~ exp(2 sigma t) over a clean window
for stop in range(50, 401, 50):
    sim.stop_iteration = stop
    sim.running = True
    sim.run()
    times.append(sim.model_time())
    energies.append(perturbation_energy(sim.state))
    print(f"t = {times[-1]:6.1f}  E' = {energies[-1]:.3e}")

logE = np.log(energies[2:])
tfit = np.array(times[2:])
sigma = np.polyfit(tfit, logE, 1)[0] / 2
print(f"measured growth rate sigma = {sigma:.4f} (KH @ Ri=0.1: ~0.1-0.2)")
assert 0.05 < sigma < 0.35, sigma
print("kelvin_helmholtz_instability: PASS")
