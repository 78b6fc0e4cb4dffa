import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.ops.fused_tendencies import fused_advective_tendencies

n = 256
grid0 = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid0, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
grid = model.grid
print("fused:", model.fused_advection, flush=True)
state = model.initial_state(u=1e-2 * jax.random.normal(jax.random.PRNGKey(0),
                                                       grid0.shape, jnp.float32))
sol = state["solution"]

def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)

bench("kernel only", lambda u, v, w, b: fused_advective_tendencies(
    grid, model.advection, model.tracer_advection, u, v, w, {"b": b}),
    sol["u"], sol["v"], sol["w"], sol["b"])
bench("tendencies", model.tendencies, state)
bench("projection", lambda s: model.project_velocities(s, jnp.float32(1e-4)), state)
bench("  fft solve", model.pressure_solver.solve, grid.interior(sol["u"]))
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import fill_halos
from clima_oceananigans_jl_tpu.utils.location import U_LOC
bench("  one field fill", lambda u: fill_halos(u, grid, U_LOC, model.bcs["u"]), sol["u"])
bench("update_state", model.update_state, state)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import hydrostatic_pressure_anomaly
bench("  pHY integral", lambda b: hydrostatic_pressure_anomaly(
    model.buoyancy, grid, {"b": b}), sol["b"])
bench("full step", lambda s: model.step(s, jnp.float32(1e-4)), state)
