"""AB2 256^3 step: per-phase timings + XLA bytes-accessed accounting.

Matches bench.py's flagship configuration (WENO5 momentum+tracer advection,
BuoyancyTracer, quasi-AB2). Bytes accessed from compiled cost analysis is the
ground truth for bandwidth-bound optimization (timings over the axon tunnel
have +-15-40% variance).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
grid = model.grid
key = jax.random.PRNGKey(0)
state = model.initial_state(u=1e-2 * jax.random.normal(key, grid.shape, grid.dtype))
jax.block_until_ready(jax.tree_util.tree_leaves(state))
print("state ready", flush=True)
dt = jnp.float32(1e-4)


def _sync(out):
    """Force a real device round-trip (block_until_ready does not always
    block under the axon relay)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def bench_fn(name, fn, *args, reps=10, donate=False):
    f = jax.jit(fn, donate_argnums=(0,) if donate else ())
    comp = f.lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    ba = ca.get("bytes accessed", 0)
    if donate:
        print(f"{name}: bytes={ba/1e9:.2f} GB (donated; timing skipped)", flush=True)
        return
    out = f(*args); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    ms = (time.perf_counter()-t0)/reps*1e3
    print(f"{name}: {ms:.2f} ms  bytes={ba/1e9:.2f} GB  ({ba/820e9*1e3:.1f} ms @820GB/s)",
          flush=True)


bench_fn("full step", model.step, state, dt)
bench_fn("tendencies", model.tendencies, state)
G = jax.jit(model.tendencies)(state)
from clima_oceananigans_jl_tpu.timesteppers.steppers import ab2_substep
# state G_prev may carry the z_slim HALO-FREE layout; pad for the plain substep
_gp = state["G_prev"]
if _gp["u"].shape != state["solution"]["u"].shape:
    _pad = tuple((h, h) for h in grid.halo)
    _gp = {k: jnp.pad(v, _pad) for k, v in _gp.items()}
bench_fn("ab2_substep", lambda s, g, gp: ab2_substep(s["solution"], g, gp,
                                                     dt, 0.1, jnp.bool_(False)),
         state, G, _gp)
bench_fn("projection", lambda s: model.project_velocities(s, dt), state)
bench_fn("update_state", model.update_state, state)
bench_fn("fill_halos all", lambda s: model.fill_all_halos(s["solution"]), state)
rhs = grid.interior(state["solution"]["u"])
bench_fn("fft solve only", model.pressure_solver.solve, rhs)
