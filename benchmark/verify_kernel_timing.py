import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import clima_oceananigans_jl_tpu.ops.fused_tendencies as ft
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = 256
grid0 = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid0, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
grid = model.grid
scheme = model.advection
state = model.initial_state(u=1e-2 * jax.random.normal(jax.random.PRNGKey(0),
                                                       grid0.shape, jnp.float32))
sol = state["solution"]
u, v, w, b = sol["u"], sol["v"], sol["w"], sol["b"]
print("ready", flush=True)

def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    # force a real device round-trip on a leaf
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)

bench("fused kernel (sum-forced)",
      lambda u, v, w, b: ft.fused_advective_tendencies(
          grid, scheme, scheme, u, v, w, {"b": b}), u, v, w, b)
bench("tendencies full", model.tendencies, state)
# tendencies with advection disabled (rest of the terms only)
import copy
m2 = copy.copy(model)
m2.fused_advection = False
m2.advection = None
class ZeroAdv:
    required_halo = 1
    is_upwind = False
    def sym_to_f(self, c, axis): return c * 0.0
    def sym_to_c(self, c, axis): return c * 0.0
m2.advection = ZeroAdv(); m2.tracer_advection = ZeroAdv()
bench("tendencies rest-only", m2.tendencies, state)
bench("update_state", model.update_state, state)
bench("ab2+implicit substep", lambda s: model.step(s, jnp.float32(1e-4)), state, reps=5)
