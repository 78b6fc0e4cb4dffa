import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from clima_oceananigans_jl_tpu import PERIODIC, FLAT, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel, _core_tendencies

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
grid0 = RectilinearGrid(size=(n, n, 1), x=(0, 2*np.pi), y=(0, 2*np.pi),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float32)
model = ShallowWaterModel(grid=grid0, gravitational_acceleration=10.0,
                          advection=WENO5())
grid = model.grid
print("fused:", model.fused_advection, "halo:", grid.halo, flush=True)
state = model.initial_state(uh=lambda x, y, z: 0.1*jnp.sin(x)*jnp.cos(y), h=1.0)
jax.block_until_ready(state); print("ready", flush=True)

def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)

sol = state["solution"]
bench("tendencies", model.tendencies, state)
from clima_oceananigans_jl_tpu.ops import fused_tendencies as ft
from functools import partial
cg = ft.ConstMetricGrid(float(2*np.pi/n), float(2*np.pi/n), 1.0)
core = lambda uh, vh, h: _core_tendencies(cg, model.advection, model.tracer_advection,
                                          model.g_const, uh, vh, h, ())
fz = ft.pallas_fuse(core, grid, 3)
print("fuse legal:", fz is not None, flush=True)
if fz is not None:
    bench("kernel only", fz, sol["uh"], sol["vh"], sol["h"])
bench("fill_all", lambda s: model.fill_all_halos(s), sol)
bench("full step", lambda s: model.step(s, jnp.float32(1e-4)), state, reps=5)
