"""Baroclinic adjustment of a meridional buoyancy front.

Mirror of /root/reference/examples/baroclinic_adjustment.jl: a 1000 km
square, 1 km deep channel (periodic x, bounded y) on a beta-plane at
45S, an initial front b = N^2 z + Db * ramp(y) with weak noise, WENO5
advection, implicit free surface. Baroclinic instability grows on the
front and slumps it, converting available potential energy to eddy
kinetic energy.

Self-check: (i) eddy (zonally-asymmetric) kinetic energy grows by orders
of magnitude from the noise floor, and (ii) the front slumps: the
domain-mean |db/dy| at mid-depth decreases. Resolution reduced from
64x64x40 (40 days) to 32x32x8 (12 days) for the CPU-backend example.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, PERIODIC, BetaPlane, Callback, HydrostaticFreeSurfaceModel,
    ImplicitFreeSurface, IterationInterval, RectilinearGrid,
    ScalarDiffusivity, Simulation, TimeStepWizard, WENO5,
)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer

km, day = 1e3, 86400.0
Lx = Ly = 1000 * km
Lz = 1 * km
Nx, Ny, Nz = 32, 32, 8

grid = RectilinearGrid(size=(Nx, Ny, Nz), x=(0, Lx), y=(-Ly / 2, Ly / 2),
                       z=(-Lz, 0), topology=(PERIODIC, BOUNDED, BOUNDED),
                       dtype=jnp.float64)

# beta plane at 45S
Omega, R = 7.292115e-5, 6.371e6
lat = -45.0
coriolis = BetaPlane(f0=2 * Omega * np.sin(np.radians(lat)),
                     beta=2 * Omega * np.cos(np.radians(lat)) / R)

# the reference's anisotropic diffusivities (aspect-ratio-scaled vertical)
kh = 0.1
aspect = (Lz / Nz) / (Lx / Nx)
closure = ScalarDiffusivity(nu=kh, kappa=kh,
                            nu_z=aspect * kh, kappa_z=aspect * kh)

model = HydrostaticFreeSurfaceModel(
    grid, coriolis=coriolis, buoyancy=BuoyancyTracer(), closure=closure,
    momentum_advection=WENO5(), tracer_advection=WENO5(),
    free_surface=ImplicitFreeSurface())

N2 = 4e-6        # s^-2 vertical stratification
M2 = 8e-8        # s^-2 horizontal buoyancy gradient of the front
dy_front = 50 * km
Db = dy_front * M2

ramp = lambda y, d: jnp.clip(y / d + 0.5, 0.0, 1.0)
key = jax.random.PRNGKey(1)
noise = 1e-2 * Db * jax.random.normal(key, model.grid.shape,
                                      model.grid.dtype)
yc = model.grid.nodes(("c", "c", "c"), with_halo=False)[1]
zc = model.grid.nodes(("c", "c", "c"), with_halo=False)[2]
b0 = N2 * zc + Db * ramp(yc, dy_front) + noise
state = model.initial_state(b=b0)


def diagnostics(s):
    g = model.grid
    u = np.asarray(g.interior(s["solution"]["u"]))
    v = np.asarray(g.interior(s["solution"]["v"]))
    ue = u - u.mean(axis=0, keepdims=True)  # zonally-asymmetric (eddy) part
    ve = v - v.mean(axis=0, keepdims=True)
    eke = 0.5 * float((ue**2 + ve**2).mean())
    b = np.asarray(g.interior(s["solution"]["b"]))
    dby = np.abs(np.diff(b[:, :, Nz // 2], axis=1)).mean() / (Ly / Ny)
    return eke, dby


sim = Simulation(model, state=state, dt=20 * 60.0, stop_time=0.0)
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=0.2, max_change=1.1, max_dt=40 * 60.0),
    IterationInterval(20))
eke0, dby0 = diagnostics(sim.state)
for stop_days in (4, 8, 12):
    sim.stop_time = stop_days * day
    sim.running = True
    sim.run()
    eke, dby = diagnostics(sim.state)
    print(f"day {stop_days:2d}: EKE = {eke:.3e} m^2/s^2  "
          f"mid-depth |db/dy| = {dby:.3e} s^-2")

print(f"EKE growth {eke / max(eke0, 1e-30):.1e}x; "
      f"front gradient {dby0:.3e} -> {dby:.3e}")
assert eke > 100 * eke0, (eke, eke0)       # instability grew from noise
assert eke > 1e-5                           # reached finite eddy amplitude
assert dby < 0.9 * dby0, (dby, dby0)        # the front slumped
print("baroclinic_adjustment: PASS")
