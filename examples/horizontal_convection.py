"""Horizontal convection driven by differential surface buoyancy.

Mirror of /root/reference/examples/horizontal_convection.jl: a 2D (x, z)
closed box with surface buoyancy b_s(x) = -b* cos(2 pi x / Lx) imposed
as a ValueBC, Ra = 1e8, Pr = 1, WENO5 + RK3.

Self-check: (i) the maximum principle — buoyancy stays within the range
imposed at the surface, [-b*, b*]; (ii) a steady overturning circulation
develops (kinetic energy rises to a finite plateau); (iii) the flow
sinks under the dense (negative-b) end: the near-surface flow converges
toward x where b_s is minimal. Resolution reduced from 128x64 to 64x32
for the CPU-backend example.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, RectilinearGrid, ScalarDiffusivity, Simulation,
    ValueBC, FieldBCs, WENO5, Callback, IterationInterval, TimeStepWizard,
)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

H = 1.0
Lx = 2 * H
Nx, Nz = 64, 32
grid = RectilinearGrid(size=(Nx, 1, Nz), x=(-Lx / 2, Lx / 2), y=(0, 1),
                       z=(-H, 0), topology=(BOUNDED, FLAT, BOUNDED),
                       dtype=jnp.float64)

b_star, Pr, Ra = 1.0, 1.0, 1e8
nu = np.sqrt(Pr * b_star * Lx**3 / Ra)
kappa = nu / Pr

# surface buoyancy: a callable BC value b_s(x, y, t) evaluated on the wall
b_bcs = FieldBCs(top=ValueBC(lambda x, y, t: -b_star * jnp.cos(2 * jnp.pi * x / Lx)))

model = NonhydrostaticModel(grid, advection=WENO5(), timestepper="RungeKutta3",
                            buoyancy=BuoyancyTracer(),
                            closure=ScalarDiffusivity(nu=nu, kappa=kappa),
                            boundary_conditions={"b": b_bcs})

state = model.initial_state()
sim = Simulation(model, state=state, dt=1e-2, stop_time=0.0)
sim.callbacks["wizard"] = Callback(
    TimeStepWizard(cfl=0.7, max_change=1.2, max_dt=0.1),
    IterationInterval(50))

g = model.grid
ke = lambda s: 0.5 * float(jnp.mean(g.interior(s["solution"]["u"])**2
                                    + g.interior(s["solution"]["w"])**2))
kes = []
for stop in (10.0, 20.0, 30.0, 40.0):
    sim.stop_time = stop
    sim.running = True
    sim.run()
    kes.append(ke(sim.state))
    print(f"t = {stop:5.1f}  KE = {kes[-1]:.4e}")

b = np.asarray(g.interior(sim.state["solution"]["b"]))
w = np.asarray(g.interior(sim.state["solution"]["w"]))[:, 0, :]

assert np.all(np.isfinite(b)) and np.all(np.isfinite(w))
# maximum principle: interior buoyancy bounded by the imposed surface range
assert b.max() <= b_star * 1.001 and b.min() >= -b_star * 1.001, (b.min(), b.max())
# circulation developed and is statistically steady (not still growing fast)
assert kes[-1] > 1e-4
assert abs(kes[-1] - kes[-2]) < 0.5 * kes[-1], kes
# downwelling under the dense end (x ~ 0 where b_s = -b*): w < 0 just
# below the surface near the center, upwelling near the buoyant walls
w_top = w[:, -4:].mean(axis=1)
center = slice(Nx // 2 - 8, Nx // 2 + 8)
assert w_top[center].mean() < 0, w_top[center].mean()
print("horizontal_convection: PASS")
