"""Donated-buffer phase timings for the AB2 step at 256^3.

ab2_phases.py times each phase standalone WITHOUT donation, which forces
XLA to copy on every dynamic-update-slice — overstating fill/projection
cost relative to their in-step (donated) behavior. Here update_state and
project_velocities are jitted with donate_argnums so their slab updates
can run in place, plus cost_analysis bytes for each.
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def bench_fn(name, fn, arg, reps=10):
    f = jax.jit(fn, donate_argnums=0)
    comp = f.lower(arg).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    ba = ca.get("bytes accessed", 0)
    # keep a reusable template: donation consumes the arg, so re-feed the output
    out = f(arg)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(out)
    _sync(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.2f} ms  bytes={ba/1e9:.2f} GB  "
          f"({ba/820e9*1e3:.1f} ms @820GB/s)", flush=True)
    return out


from clima_oceananigans_jl_tpu.ops.fused_step import fused_ab2_advance

state = bench_fn("full step (donated)", lambda s: model.step(s, dt), state)
state = bench_fn("update_state (donated)", model.update_state, state)
state = bench_fn("projection (donated)",
                 lambda s: model.project_velocities(s, dt), state)


def advance_only(s):
    sol, G = fused_ab2_advance(model, s, dt, jnp.bool_(False))
    return dict(s, solution=sol, G_prev=G)


state = bench_fn("advance-only (donated)", advance_only, state)
