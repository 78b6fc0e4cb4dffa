"""Round-2 fused-kernel experiments at 256^3 (CHAINED timing).

The axon relay returns suspiciously-instant results when a jitted
function is re-invoked with bitwise-identical input buffers (round-1
logs show 0.03-0.09 ms for multi-GB kernels). Every benchmark here
chains outputs into the next call's inputs so each execution is real.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
import clima_oceananigans_jl_tpu.ops.fused_tendencies as ft
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.advection import schemes as S

n = 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), halo=(3, 4, 3),
                       dtype=jnp.float32)
scheme = WENO5()
ks = jax.random.split(jax.random.PRNGKey(0), 4)
u0, v0, w0, c0 = (jax.random.normal(k, grid.total_shape, jnp.float32) for k in ks)
jax.block_until_ready((u0, v0, w0, c0))
print("ready", flush=True)


def bench_chained(name, fn, reps=15):
    """fn: (u,v,w,c) -> (u,v,w,c); chained so every call is distinct."""
    try:
        f = jax.jit(fn)
        args = f(u0, v0, w0, c0)
        float(args[0][5, 5, 5])  # force real device sync (block_until_ready
        t0 = time.perf_counter()  # does not block under the axon relay)
        for _ in range(reps):
            args = f(*args)
        float(args[0][5, 5, 5])
        print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)


def make_fused(sch):
    def step(u, v, w, c):
        G = ft.fused_advective_tendencies(grid, sch, sch, u, v, w,
                                          {"b": c}, interpret=False)
        s = 1e-3  # keep values bounded across the chain
        return (u + s * G["u"], v + s * G["v"], w + s * G["w"], c + s * G["b"])
    return step


# sanity anchor: known-cost matmul, chained
a0 = jax.random.normal(ks[0], (8192, 8192), jnp.float32) * 1e-2
fmm = jax.jit(lambda a: (a @ a) * 1e-6 + a * 0.5)
am = fmm(a0); float(am[5, 5])
t0 = time.perf_counter()
for _ in range(10):
    am = fmm(am)
float(am[5, 5])
print(f"sanity matmul 8192 (~25 ms @44TF/s fp32): "
      f"{(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

bench_chained("fused CSE+masks (tile heuristic)", make_fused(scheme))

orig_tiles = ft._tile_sizes
for tx, ty in [(8, 16), (16, 8), (16, 16), (8, 32), (32, 8)]:
    ft._tile_sizes = lambda *a, **kw: (tx, ty)
    bench_chained(f"tile ({tx},{ty})", make_fused(scheme))
ft._tile_sizes = orig_tiles

orig_combine = S.WENO5._combine
def combine_rcp(self, p0, p1, p2, b0, b1, b2):
    from jax.experimental import pallas as pl
    eps = self.eps
    t0 = (b0 + eps) * (b0 + eps)
    t1 = (b1 + eps) * (b1 + eps)
    t2 = (b2 + eps) * (b2 + eps)
    g0 = 0.1 * (t1 * t2)
    g1 = 0.6 * (t0 * t2)
    g2 = 0.3 * (t0 * t1)
    return (g0 * p0 + g1 * p1 + g2 * p2) * pl.reciprocal(g0 + g1 + g2,
                                                         approx=True)
S.WENO5._combine = combine_rcp
bench_chained("approx reciprocal combine", make_fused(scheme))
S.WENO5._combine = orig_combine

saved = S.WENO5.left_right_to_f
del S.WENO5.left_right_to_f
bench_chained("no-CSE (independent L/R)", make_fused(scheme))
S.WENO5.left_right_to_f = saved

bench_chained("bf16 reconstruction", make_fused(WENO5(fast_bf16=True)))
