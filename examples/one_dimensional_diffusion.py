"""One-dimensional diffusion of a Gaussian tracer.

Mirror of /root/reference/examples/one_dimensional_diffusion.jl: a single
column, constant diffusivity kappa = 1, an initial Gaussian temperature
profile, free evolution.

Self-check: the analytic solution of the 1D heat equation keeps a
Gaussian Gaussian with variance sigma^2(t) = sigma0^2 + 2 kappa t; we
assert the evolved profile matches the analytic profile pointwise and
that total heat is conserved.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, RectilinearGrid, ScalarDiffusivity, Simulation,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

Nz = 128
grid = RectilinearGrid(size=(1, 1, Nz), x=(0, 1), y=(0, 1), z=(-0.5, 0.5),
                       topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
kappa = 1.0
model = NonhydrostaticModel(grid, closure=ScalarDiffusivity(kappa=kappa),
                            tracers=("T",))

width = 0.1
state = model.initial_state(T=lambda x, y, z: jnp.exp(-z**2 / (2 * width**2)))

dz = 1.0 / Nz
dt = 0.1 * dz**2 / kappa  # diffusive-stability time scale, as the reference
sim = Simulation(model, state=state, dt=dt, stop_iteration=1000)
sim.run()

z = np.asarray(model.grid.nodes(("c", "c", "c"))[2]).ravel()
T = np.asarray(model.grid.interior(sim.state["solution"]["T"]))[0, 0, :]
t = sim.model_time()

# analytic: amplitude and width evolve so the integral is invariant.
# The walls are zero-flux, so the exact bounded-domain solution adds the
# method-of-images reflections (the first image pair contributes ~3e-3
# of the peak by the end time).
sigma2 = width**2 + 2 * kappa * t
gauss = lambda z0: width / np.sqrt(sigma2) * np.exp(-(z - z0)**2 / (2 * sigma2))
T_exact = gauss(0.0) + gauss(1.0) + gauss(-1.0)

err = np.max(np.abs(T - T_exact))
heat0 = width * np.sqrt(2 * np.pi)  # integral of the initial Gaussian
heat = np.sum(T) * dz
print(f"t = {t:.4f}  max|T - T_exact| = {err:.2e}  "
      f"heat drift = {abs(heat - heat0) / heat0:.2e}")
assert err < 2e-3, err
assert abs(heat - heat0) / heat0 < 1e-3
print("one_dimensional_diffusion: PASS")
