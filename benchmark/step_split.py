"""In-step cost split of the fully-fused 256^3 AB2 step (donated buffers).

Times step VARIANTS (each jitted with donation, like bench.py) rather
than standalone phases — standalone phase timings pay materialization
the real step doesn't. Differences between variants isolate the in-step
cost of each stage:

  kernel-only        = fused_ab2_advance + nothing else
  kernel+proj        = + fast projection (div, FFT solve, correction)
  kernel+proj+fills  = the full step (update_state)
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.ops.fused_step import fused_ab2_advance

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
grid = model.grid
key = jax.random.PRNGKey(0)
state = model.initial_state(u=1e-2 * jax.random.normal(key, grid.shape, grid.dtype))
jax.block_until_ready(jax.tree_util.tree_leaves(state))
dt = jnp.float32(1e-4)
print("state ready; fused_step =", model.fused_step, flush=True)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def bench(name, fn, reps=10):
    f = jax.jit(fn, donate_argnums=0)
    s = jax.tree_util.tree_map(lambda x: x + 0, state)
    s = f(s, dt)
    s = f(s, dt)
    _sync(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = f(s, dt)
    _sync(s)
    ms = (time.perf_counter() - t0) / reps * 1e3
    comp = jax.jit(fn, donate_argnums=0).lower(
        jax.tree_util.tree_map(lambda x: x + 0, state), dt).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    ba = ca.get("bytes accessed", 0)
    print(f"{name:24s} {ms:7.2f} ms  bytes={ba/1e9:.2f} GB ({ba/820e9*1e3:.1f} ms floor)",
          flush=True)


def kernel_only(s, dt):
    euler = jnp.bool_(False)
    sol, G = fused_ab2_advance(model, s, dt, euler)
    return dict(s, solution=sol, G_prev=G)


def kernel_proj(s, dt):
    euler = jnp.bool_(False)
    sol, G = fused_ab2_advance(model, s, dt, euler)
    s = dict(s, solution=sol, G_prev=G)
    return model.project_velocities(s, dt)


def kernel_proj_fill(s, dt):
    euler = jnp.bool_(False)
    sol, G = fused_ab2_advance(model, s, dt, euler)
    s = dict(s, solution=sol, G_prev=G)
    s = model.project_velocities(s, dt)
    return model.update_state(s)


bench("kernel only", kernel_only)
bench("kernel+proj", kernel_proj)
bench("kernel+proj+fills", kernel_proj_fill)
bench("full step", model.step)
