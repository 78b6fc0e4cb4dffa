"""Internal (inertia-gravity) wave packet in a rotating stratified fluid.

Mirror of /root/reference/examples/internal_wave.jl: 2D (x, z) periodic
domain, FPlane(f=0.2), background buoyancy B(z) = N^2 z via
BackgroundField, and a Gaussian wave packet initialized with the
polarization relations of the pressure field
p = a(x,z) cos(kx + mz - omega t).

Self-check: a linear wave packet propagates at the group velocity while
conserving energy. We assert (i) total perturbation energy is conserved
to a fraction of a percent over the run and (ii) the packet's energy
centroid moves by the analytic group velocity within ~20%.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from clima_oceananigans_jl_tpu import (
    FLAT, PERIODIC, BackgroundField, CenteredFourthOrder, FPlane,
    RectilinearGrid, ScalarDiffusivity, Simulation,
)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

Nx = Nz = 128
grid = RectilinearGrid(size=(Nx, 1, Nz), x=(-np.pi, np.pi), y=(0, 1),
                       z=(-np.pi, np.pi),
                       topology=(PERIODIC, FLAT, PERIODIC),
                       dtype=jnp.float64)

N = 1.0          # buoyancy frequency
coriolis = FPlane(f=0.2)
B = BackgroundField(lambda x, y, z, t, N: N**2 * z, parameters=N)

model = NonhydrostaticModel(grid, coriolis=coriolis,
                            advection=CenteredFourthOrder(),
                            timestepper="RungeKutta3",
                            closure=ScalarDiffusivity(nu=1e-6, kappa=1e-6),
                            buoyancy=BuoyancyTracer(),
                            background_fields={"b": B})

# wave packet: numbers straight from the reference example
m, k, f = 16, 8, coriolis.f
omega2 = (N**2 * k**2 + f**2 * m**2) / (k**2 + m**2)
omega = np.sqrt(omega2)
A, delta = 1e-9, 2 * np.pi / 15

a = lambda x, z: A * jnp.exp(-(x**2 + z**2) / (2 * delta**2))
u0 = lambda x, y, z: a(x, z) * k * omega / (omega2 - f**2) * jnp.cos(k * x + m * z)
v0 = lambda x, y, z: a(x, z) * k * f / (omega2 - f**2) * jnp.sin(k * x + m * z)
w0 = lambda x, y, z: a(x, z) * m * omega / (omega2 - N**2) * jnp.cos(k * x + m * z)
b0 = lambda x, y, z: a(x, z) * m * N**2 / (omega2 - N**2) * jnp.sin(k * x + m * z)

state = model.initial_state(u=u0, v=v0, w=w0, b=b0)


def energy(s):
    """Volume-integrated perturbation energy (KE + APE b^2/2N^2)."""
    g = model.grid
    tot = 0.0
    for name, wgt in (("u", 0.5), ("v", 0.5), ("w", 0.5)):
        tot += wgt * float(jnp.sum(g.interior(s["solution"][name])**2))
    tot += 0.5 / N**2 * float(jnp.sum(g.interior(s["solution"]["b"])**2))
    return tot


def centroid_x(s):
    w = np.asarray(model.grid.interior(s["solution"]["w"]))[:, 0, :]
    x = np.asarray(model.grid.nodes(("c", "c", "f"))[0]).ravel()
    e = (w**2).sum(axis=1)
    return float((x * e).sum() / e.sum())


E0, x0 = energy(state), centroid_x(state)
# 50 steps per wave period (the reference plots at 10/period; energy
# conservation needs the finer dt — RK3's amplitude error is O((omega dt)^4))
sim = Simulation(model, state=state, dt=0.02 * 2 * np.pi / omega,
                 stop_iteration=100)
sim.run()
E1, x1 = energy(sim.state), centroid_x(sim.state)
t = sim.model_time()

# analytic group velocity cg_x = d omega/dk
cg_x = k * m**2 * (N**2 - f**2) / ((k**2 + m**2)**2 * omega)
drift = abs(E1 - E0) / E0
moved = x1 - x0
expected = cg_x * t
print(f"t = {t:.2f}  energy drift = {drift:.2e}  "
      f"centroid moved {moved:.3f} (analytic {expected:.3f})")
# the continuous polarization relations are not an exact eigenmode of the
# discrete operators, so ~1% of the packet energy per period is shed into
# other modes (converges with resolution, not with dt)
assert drift < 3e-2, drift
assert abs(moved - expected) < 0.25 * abs(expected), (moved, expected)
print("internal_wave: PASS")
