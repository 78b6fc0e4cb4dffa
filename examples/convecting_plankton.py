"""Convecting plankton: biological growth in a convective mixed layer.

Mirror of /root/reference/examples/convecting_plankton.jl: 2D (x, z)
domain, surface cooling that shuts off in time (a time-dependent flux
BC), deep stratification, and a plankton tracer P with a depth-dependent
growth minus mortality forcing (continuous-form Forcing with
field_dependencies=P):

    dP/dt = (mu0 exp(z / lambda) - m) P

Self-check: (i) convection spins up while the cooling is on; (ii)
plankton grow where light is (net production near the surface): the
horizontally-averaged P increases near the surface and decays at depth;
(iii) P stays positive. Resolution reduced from 64x64 (24 h) to 32x32
(8 h) for the CPU-backend example.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, Callback, FieldBCs, FluxBC, Forcing, FPlane,
    GradientBC, IterationInterval, RectilinearGrid, ScalarDiffusivity,
    Simulation, TimeStepWizard, UpwindBiasedFifthOrder,
)
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import BC
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

hour, day = 3600.0, 86400.0
grid = RectilinearGrid(size=(32, 1, 32), x=(0, 64), y=(0, 1), z=(-64, 0),
                       topology=(PERIODIC, FLAT, BOUNDED),
                       dtype=jnp.float64)

Q0, shutoff = 1e-7, 2 * hour   # stronger initial cooling for the short run
N2 = 1e-5

# time-dependent surface buoyancy flux: Q(t) = Q0 exp(-t^4 / (24 shutoff^4)),
# a callable BC value evaluated at the traced clock time
buoyancy_flux = lambda x, y, t: Q0 * jnp.exp(-t**4 / (24 * shutoff**4))
b_bcs = FieldBCs(top=FluxBC(buoyancy_flux), bottom=GradientBC(N2))

# plankton growth - mortality, continuous form with field dependency P
mu0, lam, mort = 1 / day, 5.0, 0.1 / day
plankton_dynamics = Forcing(
    lambda x, y, z, t, P, p: (p["mu0"] * jnp.exp(z / p["lam"]) - p["m"]) * P,
    field_dependencies="P", parameters={"mu0": mu0, "lam": lam, "m": mort})

model = NonhydrostaticModel(
    grid, advection=UpwindBiasedFifthOrder(), timestepper="RungeKutta3",
    closure=ScalarDiffusivity(nu=1e-4, kappa=1e-4),
    coriolis=FPlane(f=1e-4), tracers=("b", "P"),
    buoyancy=BuoyancyTracer(), forcing={"P": plankton_dynamics},
    boundary_conditions={"b": b_bcs})

mixed_layer_depth = 16.0
key = jax.random.PRNGKey(3)
g = model.grid
zc = g.nodes(("c", "c", "c"), with_halo=False)[2]
noise = 1e-3 * N2 * 64 * jnp.exp(zc / 4) * jax.random.normal(key, g.shape)
b0 = jnp.where(zc < -mixed_layer_depth, N2 * zc,
               -N2 * mixed_layer_depth) + noise
state = model.initial_state(b=b0, P=1.0)

sim = Simulation(model, state=state, dt=30.0, stop_time=8 * hour)
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=0.6, max_change=1.1, max_dt=2 * 60.0),
    IterationInterval(10))
sim.run()

P = np.asarray(g.interior(sim.state["solution"]["P"]))
w = np.asarray(g.interior(sim.state["solution"]["w"]))
zc_i = np.asarray(zc).ravel()
Pbar = P.mean(axis=(0, 1))
t = sim.model_time()

# analytic no-mixing bounds: P grows at most at the surface rate and
# decays at the mortality rate at depth
surf = Pbar[zc_i > -5.0].mean()
deep = Pbar[zc_i < -40.0].mean()
print(f"t = {t / hour:.1f} h: surface P = {surf:.4f}, deep P = {deep:.4f}, "
      f"max|w| = {np.abs(w).max():.2e} m/s")
assert np.all(P > 0)
# convective mixing dilutes the surface growth over the mixed layer, so
# the surface excess is modest but must be clearly positive and clearly
# separated from the dark zone's net-mortality decay
assert surf > 1.02, surf                 # net growth in the euphotic zone
assert deep < 1.0, deep                  # net mortality in the dark
assert surf - deep > 0.03, (surf, deep)
assert surf <= np.exp((mu0 - mort) * t) * 1.01  # bounded by the light-limit rate
assert np.abs(w).max() > 1e-4            # convection happened
print("convecting_plankton: PASS")
