import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.advection.schemes import transport, upwind_biased_product
from clima_oceananigans_jl_tpu.advection.fluxes import div_vu, div_Uc
from clima_oceananigans_jl_tpu.ops import stencil as st
from clima_oceananigans_jl_tpu.utils.location import U_LOC, CENTER

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, PERIODIC), dtype=jnp.float32)
scheme = WENO5()
key = jax.random.PRNGKey(0)
u = jax.random.normal(key, grid.total_shape, jnp.float32)
v = jnp.roll(u, 3, 0); w = jnp.roll(u, 5, 1); c = jnp.roll(u, 7, 2)

def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms", flush=True)

bench("weno left_to_f axis0", lambda a: scheme.left_to_f(a, 0), c)
bench("weno left+right axis0", lambda a: scheme.left_to_f(a, 0) + scheme.right_to_f(a, 0), c)
bench("upwind transport axis0", lambda vel, a: transport(scheme, vel, a, 0, True), u, c)
bench("transport all 3 axes", lambda uu, vv, ww, a:
      transport(scheme, uu, a, 0, True) + transport(scheme, vv, a, 1, True)
      + transport(scheme, ww, a, 2, True), u, v, w, c)
bench("div_Uc", lambda uu, vv, ww, a: div_Uc(grid, scheme, uu, vv, ww, a), u, v, w, c)
bench("div_vu", lambda uu, vv, ww: div_vu(grid, scheme, uu, vv, ww), u, v, w)

Ax = grid.Ax(U_LOC); Ay = grid.Ay((0,)) if False else grid.Ay(U_LOC); V = grid.V(CENTER)
bench("transport*Ax (bcast)", lambda uu, a: grid.Ax(U_LOC) * transport(scheme, uu, a, 0, True), u, c)
bench("dxc(transport)", lambda uu, a: st.dxc(transport(scheme, uu, a, 0, True)), u, c)
bench("dxc(Ax*transport)", lambda uu, a: st.dxc(grid.Ax(U_LOC) * transport(scheme, uu, a, 0, True)), u, c)
bench("dxc(Ax*transport)/V", lambda uu, a: st.dxc(grid.Ax(U_LOC) * transport(scheme, uu, a, 0, True)) / grid.V(CENTER), u, c)
bench("full div no metrics", lambda uu, vv, ww, a:
      (st.dxc(transport(scheme, uu, a, 0, True))
       + st.dyc(transport(scheme, vv, a, 1, True))
       + st.dzc(transport(scheme, ww, a, 2, True))), u, v, w, c)

from jax import lax
def div_barrier(uu, vv, ww, a):
    fx = lax.optimization_barrier(grid.Ax(U_LOC) * transport(scheme, uu, a, 0, True))
    fy = lax.optimization_barrier(grid.Ay(U_LOC) * transport(scheme, vv, a, 1, True))
    fz = lax.optimization_barrier(grid.Az(U_LOC) * transport(scheme, ww, a, 2, True))
    return (st.dxc(fx) + st.dyc(fy) + st.dzc(fz)) / grid.V(CENTER)
bench("div with barriers", div_barrier, u, v, w, c)
