"""Wind-driven mixing and convection in the surface ocean.

Mirror of /root/reference/examples/ocean_wind_mixing_and_convection.jl:
a stretched-z grid (fine near the surface), SeawaterBuoyancy with a
linear T/S equation of state, surface cooling (200 W/m^2), wind stress
(10 m/s winds), a salinity-dependent evaporation flux (discrete-form
field-dependent BC), AMD large-eddy closure, FPlane rotation.

Self-check: surface forcing must (i) cool the sea surface, (ii) deepen
the mixed layer (the top region becomes vertically homogeneous in T),
and (iii) spin up turbulent vertical velocities from a quiescent start.
Domain reduced from 32x32x24 to 16x16x16 for the CPU-backend example.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, PERIODIC, FPlane, FieldBCs, FluxBC, GradientBC,
    LinearEquationOfState, RectilinearGrid, SeawaterBuoyancy, Simulation,
    UpwindBiasedFifthOrder,
)
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import BC
from clima_oceananigans_jl_tpu.closures.eddy_viscosity import (
    AnisotropicMinimumDissipation)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

Nz, Lz = 16, 32.0
# stretched z faces: finer near the surface (reference's refinement=1.2,
# stretching=12 profile)
refinement, stretching = 1.2, 12.0
k = np.arange(Nz + 1)
h = k / Nz
zeta = 1 + (h - 1) / refinement
Sigma = (1 - np.exp(-stretching * h)) / (1 - np.exp(-stretching))
z_faces = Lz * (zeta * Sigma - 1)

grid = RectilinearGrid(size=(16, 16, Nz), x=(0, 64), y=(0, 64), z=z_faces,
                       topology=(PERIODIC, PERIODIC, BOUNDED),
                       dtype=jnp.float64)

buoyancy = SeawaterBuoyancy(equation_of_state=LinearEquationOfState(
    thermal_expansion=2e-4, haline_contraction=8e-4))

QT = 200.0 / (1026.0 * 3991.0)     # K m/s surface temperature flux (cooling)
dTdz = 0.01                        # K/m initial/bottom temperature gradient
Qu = -1.225 / 1026.0 * 2.5e-3 * 10.0 * abs(10.0)  # m^2/s^2 wind stress
evaporation_rate = 1e-3 / 3600.0   # m/s


def QS(grid, clock, fields):
    """Salinity flux from evaporation, proportional to surface salinity
    (discrete-form field-dependent flux, reference example's Qs)."""
    return -evaporation_rate * fields["S"]


model = NonhydrostaticModel(
    grid, buoyancy=buoyancy, advection=UpwindBiasedFifthOrder(),
    timestepper="RungeKutta3", tracers=("T", "S"),
    coriolis=FPlane(f=1e-4), closure=AnisotropicMinimumDissipation(),
    boundary_conditions={
        "u": FieldBCs(top=FluxBC(Qu)),
        "T": FieldBCs(top=FluxBC(QT), bottom=GradientBC(dTdz)),
        "S": FieldBCs(top=BC("flux", QS, discrete=True)),
    })

key = jax.random.PRNGKey(0)
ku, kw, kT = jax.random.split(key, 3)
g = model.grid
zc = g.nodes(("c", "c", "c"), with_halo=False)[2]
noise_prof = zc / Lz * (1 + zc / Lz)  # zero at top and bottom
T0 = (20.0 + dTdz * zc
      + dTdz * Lz * 1e-6 * noise_prof * jax.random.normal(kT, g.shape))
u0 = np.sqrt(abs(Qu)) * 1e-3 * noise_prof * jax.random.normal(ku, g.shape)
w0 = np.sqrt(abs(Qu)) * 1e-3 * noise_prof * jax.random.normal(kw, g.shape)
state = model.initial_state(T=T0, u=u0, w=w0, S=35.0)


def surface_T(s):
    return float(jnp.mean(g.interior(s["solution"]["T"])[:, :, -1]))


def w_rms(s):
    return float(jnp.sqrt(jnp.mean(g.interior(s["solution"]["w"])**2)))


T_surf0 = surface_T(state)
sim = Simulation(model, state=state, dt=10.0, stop_time=60 * 60.0)
from clima_oceananigans_jl_tpu import Callback, IterationInterval, TimeStepWizard
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=0.6, max_change=1.1, max_dt=15.0),
    IterationInterval(10))
sim.run()

T_surf1 = surface_T(sim.state)
T = np.asarray(g.interior(sim.state["solution"]["T"]))
S = np.asarray(g.interior(sim.state["solution"]["S"]))
zc_i = np.asarray(zc).ravel()
Tbar = T.mean(axis=(0, 1))

# mixed-layer formation: surface cooling + wind erode the stable initial
# gradient dT/dz = 0.01 K/m near the surface (and can invert it); the
# fitted near-surface slope must drop well below the initial one, while
# the deep gradient stays intact
top = zc_i > -6.0
slope_top = np.polyfit(zc_i[top], Tbar[top], 1)[0]
deep = zc_i < -16.0
slope_deep = np.polyfit(zc_i[deep], Tbar[deep], 1)[0]
print(f"surface T: {T_surf0:.4f} -> {T_surf1:.4f} K; "
      f"near-surface dT/dz {slope_top:+.2e} (initial {dTdz:+.2e}), "
      f"deep {slope_deep:+.2e}; w_rms = {w_rms(sim.state):.2e} m/s; "
      f"surface S = {S[:, :, -1].mean():.4f}")
assert T_surf1 < T_surf0 - 0.005, (T_surf0, T_surf1)   # cooled
assert slope_top < 0.5 * dTdz, slope_top               # mixed layer forming
assert abs(slope_deep - dTdz) < 0.2 * dTdz             # interior untouched
assert w_rms(sim.state) > 1e-4                         # convection spun up
assert S[:, :, -1].mean() > 35.0                       # evaporation salted the surface
print("ocean_wind_mixing_and_convection: PASS")
