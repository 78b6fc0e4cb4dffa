import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (
    fill_halos, fill_halos_axis, regularize_bcs)
from clima_oceananigans_jl_tpu.utils.location import U_LOC, CENTER

n = 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), halo=(3, 4, 3),
                       dtype=jnp.float32)
bcs = regularize_bcs(grid, U_LOC)
x = jax.random.normal(jax.random.PRNGKey(0), grid.total_shape, jnp.float32)

def bench(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms", flush=True)

bench("axis0 periodic", lambda a: fill_halos_axis(a, grid, U_LOC, 0, bcs.west, bcs.east), x)
bench("axis1 periodic", lambda a: fill_halos_axis(a, grid, U_LOC, 1, bcs.south, bcs.north), x)
bench("axis2 bounded", lambda a: fill_halos_axis(a, grid, U_LOC, 2, bcs.bottom, bcs.top), x)
bench("full fill_halos", lambda a: fill_halos(a, grid, U_LOC, bcs), x)
bench("fill CENTER", lambda a: fill_halos(a, grid, CENTER, regularize_bcs(grid, CENTER)), x)
