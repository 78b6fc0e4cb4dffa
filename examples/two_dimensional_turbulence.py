"""Freely-decaying two-dimensional turbulence.

Mirror of /root/reference/examples/two_dimensional_turbulence.jl: doubly
periodic (x, y) domain, random initial velocity, RK3 + 5th-order upwind,
small Laplacian viscosity; vorticity and speed are the reference's
plotted diagnostics.

Self-check: 2D turbulence obeys selective decay - enstrophy
Z = <omega^2>/2 (concentrated at small scales by the forward enstrophy
cascade) decays much faster than energy E (which inverse-cascades to
large scales). We assert both decay, that the enstrophy loss far
exceeds the energy loss, and that a sizeable fraction of the energy
survives.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    FLAT, PERIODIC, RectilinearGrid, ScalarDiffusivity, Simulation,
    UpwindBiasedFifthOrder,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.ops import stencil as st

N = 128
grid = RectilinearGrid(size=(N, N, 1), extent=(2 * np.pi, 2 * np.pi, 1),
                       topology=(PERIODIC, PERIODIC, FLAT),
                       dtype=jnp.float64)
nu = 1e-5  # as the reference example
model = NonhydrostaticModel(grid, timestepper="RungeKutta3",
                            advection=UpwindBiasedFifthOrder(),
                            closure=ScalarDiffusivity(nu=nu))

# band-limited random initial flow: a divergence-free streamfunction with
# energy in wavenumbers 2..6 (the reference's rand() per grid point puts
# all energy at the grid scale, which the upwind dissipation removes
# before the inverse cascade can act — large-scale seeding shows the
# selective-decay physics cleanly)
rng = np.random.default_rng(7)
xg, yg, _ = model.grid.nodes(("c", "c", "c"), with_halo=False)
x2 = np.asarray(xg).reshape(-1, 1)
y2 = np.asarray(yg).reshape(1, -1)
psi = np.zeros((N, N))
for kx in range(-6, 7):
    for ky in range(-6, 7):
        kk = np.hypot(kx, ky)
        if not 2 <= kk <= 6:
            continue
        phase = rng.uniform(0, 2 * np.pi)
        psi += np.cos(kx * x2 + ky * y2 + phase) / kk**2
ui = np.gradient(psi, axis=1) / (2 * np.pi / N) * -1.0
vi = np.gradient(psi, axis=0) / (2 * np.pi / N)
scale = 0.5 / max(np.abs(ui).max(), np.abs(vi).max())
state = model.initial_state(u=scale * ui[:, :, None], v=scale * vi[:, :, None])


def diagnostics(s):
    g = model.grid
    u, v = s["solution"]["u"], s["solution"]["v"]
    omega = st.dxf(v) / g.dx(("f", "f", "c")) - st.dyf(u) / g.dy(("f", "f", "c"))
    E = 0.5 * float(jnp.mean(g.interior(u)**2 + g.interior(v)**2))
    Z = 0.5 * float(jnp.mean(g.interior(omega)**2))
    return E, Z


E0, Z0 = diagnostics(state)
sim = Simulation(model, state=state, dt=0.05, stop_time=40.0)
sim.run()
E1, Z1 = diagnostics(sim.state)
t = sim.model_time()

frac_E = (E0 - E1) / E0
frac_Z = (Z0 - Z1) / Z0
print(f"t = {t:.1f}: energy decay {100 * frac_E:.1f}%, "
      f"enstrophy decay {100 * frac_Z:.1f}%")
assert 0 < frac_E < 1 and 0 < frac_Z < 1
# selective decay: the forward cascade moves enstrophy to small scales
# where it dissipates, while the inverse cascade shelters the energy
assert frac_E < 0.35, frac_E
assert frac_Z > 2 * frac_E, (frac_Z, frac_E)
print("two_dimensional_turbulence: PASS")
