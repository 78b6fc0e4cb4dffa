"""Tilted bottom boundary layer over a 3-degree slope.

Mirror of /root/reference/examples/tilted_bottom_boundary_layer.jl: the
domain is rotated into slope coordinates — gravity and the rotation axis
are tilted by theta = 3 degrees (BuoyancyTracer(gravity_unit_vector),
ConstantCartesianCoriolis), the stratification N^2 = 1e-5 s^-2 rides a
BackgroundField B = N^2 (x sin(theta) + z cos(theta)), and a far-field
along-slope current V_inf = 0.1 m/s feels quadratic bottom drag through
discrete-form (field-dependent) flux boundary conditions.

Self-check: bottom drag spins down the along-slope flow in a thin layer
(total v + V_inf reduced near the wall, unchanged aloft) and rotation
turns the drag-induced stress into a cross-slope (Ekman) flow confined
near the bottom. Resolution reduced from 128x64 (2 days) to 48x24 (4 h)
for the CPU-backend example.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, BackgroundField, Callback,
    ConstantCartesianCoriolis, FieldBCs, IterationInterval, RectilinearGrid,
    ScalarDiffusivity, Simulation, TimeStepWizard, UpwindBiasedFifthOrder,
)
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import BC
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.ops import stencil as st

Lx, Lz, Nx, Nz = 400.0, 100.0, 48, 24
# bottom-refined stretched z (fine spacing at the wall)
s = 2.5
k = np.arange(Nz + 1)
z_faces = Lz * (np.exp(s * k / Nz) - 1) / (np.exp(s) - 1)

grid = RectilinearGrid(size=(Nx, 1, Nz), x=(0, Lx), y=(0, 1), z=z_faces,
                       topology=(PERIODIC, FLAT, BOUNDED),
                       dtype=jnp.float64)

theta = np.radians(3.0)
# our gravity_unit_vector points DOWN; the reference's ghat is the up-vector
up = (np.sin(theta), 0.0, np.cos(theta))
buoyancy = BuoyancyTracer(gravity_unit_vector=(-up[0], -up[1], -up[2]))
f0 = 1e-4
coriolis = ConstantCartesianCoriolis(fx=f0 * up[0], fy=0.0, fz=f0 * up[2])

N2 = 1e-5
B = BackgroundField(
    lambda x, y, z, t, p: p["N2"] * (x * p["sx"] + z * p["sz"]),
    parameters={"N2": N2, "sx": up[0], "sz": up[2]})

V_inf = 0.1
z1 = float(z_faces[1]) / 2   # first cell center height
cd = (0.4 / np.log(z1 / 0.1))**2  # von Karman / roughness 0.1 m


def drag_u(grid, t, fields):
    u = fields["u"]
    v_at_u = st.ixf(st.iyc(fields["v"]))
    return -cd * jnp.sqrt(u**2 + (v_at_u + V_inf)**2) * u


def drag_v(grid, t, fields):
    v = fields["v"]
    u_at_v = st.ixc(st.iyf(fields["u"]))
    return -cd * jnp.sqrt(u_at_v**2 + (v + V_inf)**2) * (v + V_inf)


model = NonhydrostaticModel(
    grid, buoyancy=buoyancy, coriolis=coriolis,
    advection=UpwindBiasedFifthOrder(), timestepper="RungeKutta3",
    closure=ScalarDiffusivity(nu=1e-4, kappa=1e-4),
    background_fields={"b": B},
    boundary_conditions={
        "u": FieldBCs(bottom=BC("flux", drag_u, discrete=True)),
        "v": FieldBCs(bottom=BC("flux", drag_v, discrete=True)),
    })

state = model.initial_state()
sim = Simulation(model, state=state, dt=20.0, stop_time=4 * 3600.0)
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=0.5, max_change=1.1, max_dt=60.0),
    IterationInterval(10))
sim.run()

g = model.grid
zc = np.asarray(g.nodes(("c", "c", "c"))[2]).ravel()
u = np.asarray(g.interior(sim.state["solution"]["u"])).mean(axis=(0, 1))
v = np.asarray(g.interior(sim.state["solution"]["v"])).mean(axis=(0, 1))
total_v = v + V_inf

near = zc < 10.0
aloft = zc > 50.0
print(f"total along-slope flow: bottom 10 m min {total_v[near].min():.4f}, "
      f"aloft mean {total_v[aloft].mean():.4f} (V_inf = {V_inf})")
print(f"cross-slope flow: bottom max|u| {np.abs(u[near]).max():.2e}, "
      f"aloft max|u| {np.abs(u[aloft]).max():.2e}")
assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))
assert total_v[near].min() < 0.85 * V_inf          # drag deficit at the wall
assert abs(total_v[aloft].mean() - V_inf) < 0.1 * V_inf   # far field intact
assert np.abs(u[near]).max() > 3 * np.abs(u[aloft]).max()  # Ekman layer confined
assert np.abs(u[near]).max() > 1e-3                # cross-slope flow developed
print("tilted_bottom_boundary_layer: PASS")
