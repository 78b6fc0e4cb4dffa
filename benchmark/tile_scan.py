import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import clima_oceananigans_jl_tpu.ops.fused_tendencies as ft
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5

n = 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), halo=(3, 4, 3),
                       dtype=jnp.float32)
scheme = WENO5()
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float32) for k in ks)

orig = ft._tile_sizes
for tx, ty in [(8, 128), (8, 64), (16, 64), (16, 128), (8, 256), (32, 32), (4, 128), (8, 32)]:
    ft._tile_sizes = lambda *a, **kw: (tx, ty)
    try:
        f = jax.jit(lambda u, v, w, c: ft.fused_advective_tendencies(
            grid, scheme, scheme, u, v, w, {"b": c}, interpret=False))
        out = f(u, v, w, c); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(u, v, w, c)
        jax.block_until_ready(out)
        print(f"tile ({tx},{ty}): {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"tile ({tx},{ty}): FAIL {str(e)[:90]}", flush=True)
ft._tile_sizes = orig
