"""Batched perf experiments (one process, one TPU connection)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
grid0 = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid0, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
grid = model.grid
state = model.initial_state(u=1e-2 * jax.random.normal(jax.random.PRNGKey(0),
                                                       grid0.shape, jnp.float32))
jax.block_until_ready(state)
print("state ready", flush=True)

def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out

bench("full AB2 step", lambda s: model.step(s, jnp.float32(1e-4)), state)
bench("tendencies (fused)", model.tendencies, state)
bench("projection", lambda s: model.project_velocities(s, jnp.float32(1e-4)), state)
bench("update_state", model.update_state, state)

# pHY: flip-cumsum-flip vs triangular-matmul on the MXU
b = state["solution"]["b"]
from clima_oceananigans_jl_tpu.ops import stencil as st
from clima_oceananigans_jl_tpu.utils.location import W_LOC
def ph_cumsum(b):
    bf = st.izf(b)
    S = bf * grid.dz(W_LOC)
    Nz, Hz = grid.Nz, grid.Hz
    S_int = S[:, :, Hz + 1: Hz + Nz + 1]
    return -jnp.flip(jnp.cumsum(jnp.flip(S_int, -1), -1), -1)
def ph_matmul(b):
    bf = st.izf(b)
    S = bf * grid.dz(W_LOC)
    Nz, Hz = grid.Nz, grid.Hz
    S_int = S[:, :, Hz + 1: Hz + Nz + 1]
    # reversed-cumsum(S)[k] = sum_{j>=k} S[j]  ==  S @ U where U[j,k] = (j>=k)
    U = jnp.triu(jnp.ones((Nz, Nz), S.dtype)).T  # (j,k): 1 if j >= k
    return -jax.lax.dot_general(S_int, U, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
a = bench("pHY flip-cumsum", ph_cumsum, b)
c = bench("pHY MXU matmul", ph_matmul, b)
print("pHY agree:", bool(jnp.allclose(a, c, atol=1e-6)), flush=True)

# rfft-based Poisson vs current
rhs = grid.interior(state["solution"]["u"])
bench("fft+dct solve (current)", model.pressure_solver.solve, rhs)
import jax.scipy.fft as jfft
lamx = model.pressure_solver.eigenvalues[0]
lamy = model.pressure_solver.eigenvalues[1]
lamz = model.pressure_solver.eigenvalues[2]
def solve_rfft(rhs):
    b = jfft.dct(rhs, type=2, axis=2, norm="ortho")
    b = jnp.fft.rfft(b, axis=0)
    b = jnp.fft.fft(b, axis=1)
    lam = lamx[: n // 2 + 1] + lamy + lamz
    phi = -b / jnp.where(lam == 0, 1.0, lam)
    phi = phi.at[0, 0, 0].set(0.0)
    phi = jnp.fft.ifft(phi, axis=1)
    phi = jnp.fft.irfft(phi, n=n, axis=0)
    return jfft.idct(phi, type=2, axis=2, norm="ortho").astype(jnp.float32)
d = bench("rfft solve", solve_rfft, rhs)
ref = model.pressure_solver.solve(rhs)
print("rfft agree:", bool(jnp.allclose(d, ref, atol=5e-4 * float(jnp.abs(ref).max()) + 1e-12)), flush=True)
