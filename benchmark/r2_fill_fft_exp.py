"""Round-2 experiments: MXU-DCT FFT solve, halo-fill variants, full step.

All chained + fetch-synced (block_until_ready does not reliably block
under the axon relay).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import fill_halos, default_bcs
from clima_oceananigans_jl_tpu.utils.location import CENTER

n = 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), halo=(3, 4, 3),
                       dtype=jnp.float32)
model = NonhydrostaticModel(grid, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
mgrid = model.grid
x0 = jax.random.normal(jax.random.PRNGKey(0), mgrid.total_shape, jnp.float32)
print("ready", flush=True)


def bench1(name, fn, x_init, reps=15):
    try:
        f = jax.jit(fn)
        x = f(x_init)
        float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[5])
        t0 = time.perf_counter()
        for _ in range(reps):
            x = f(x)
        float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[5])
        dt_ms = (time.perf_counter() - t0) / reps * 1e3
        # cost analysis
        try:
            ca = jax.jit(fn).lower(x_init).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            ba = ca.get("bytes accessed", 0) / 1e9
        except Exception:
            ba = float("nan")
        print(f"{name}: {dt_ms:.2f} ms  bytes={ba:.2f} GB", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:110]}", flush=True)


# --- FFT solve (now MXU-DCT along z) ---
rhs0 = mgrid.interior(x0)
bench1("fft solve (MXU DCT z)", lambda x: model.pressure_solver.solve(x) + rhs0,
       rhs0)

# --- full projection ---
state = model.initial_state(u=1e-2 * jax.random.normal(jax.random.PRNGKey(1),
                                                       mgrid.shape, jnp.float32))
dtv = jnp.float32(1e-4)
bench1("projection (halo-free)", lambda s: model.project_velocities(s, dtv), state)

# --- fill variants on one field ---
H, HY = mgrid.Hx, mgrid.Hy
N = mgrid.Nx
bcs = default_bcs(mgrid, CENTER)
bench1("fill current (3 concats)", lambda a: fill_halos(a, mgrid, CENTER, bcs), x0)

T0, T1, T2 = mgrid.total_shape
ix = np.arange(T0); ix = np.where(ix < H, ix + N, ix); ix = np.where(ix >= H + N, ix - N, ix)
iy = np.arange(T1); iy = np.where(iy < HY, iy + N, iy); iy = np.where(iy >= HY + N, iy - N, iy)
Hz, Nz = mgrid.Hz, mgrid.Nz
iz = np.arange(T2)
iz = np.where(iz < Hz, np.clip(2 * Hz - 1 - iz, Hz, Hz + Nz - 1), iz)
iz = np.where(iz >= Hz + Nz, np.clip(2 * (Hz + Nz) - 1 - iz, Hz, Hz + Nz - 1), iz)
gather_idx = np.ix_(ix, iy, iz)


def fill_gather(a):
    return a[gather_idx]


bench1("fill gather (one np.ix_)", fill_gather, x0)


def fill_take(a):
    a = jnp.take(a, jnp.asarray(ix), axis=0)
    a = jnp.take(a, jnp.asarray(iy), axis=1)
    return jnp.take(a, jnp.asarray(iz), axis=2)


bench1("fill 3x take", fill_take, x0)


def fill_roll_where(a):
    for axis, h, nn in ((0, H, N), (1, HY, N)):
        i = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
        a = jnp.where(i < h, jnp.roll(a, nn, axis),
                      jnp.where(i >= nn + h, jnp.roll(a, -nn, axis), a))
    # bounded z via one concat of mirror slabs
    lo = a[:, :, 2 * Hz - 1:Hz - 1:-1] if Hz else None
    hi = a[:, :, Hz + Nz - 1:Hz + Nz - 1 - Hz:-1]
    return jnp.concatenate([a[:, :, 2 * Hz - 1:Hz - 1:-1],
                            a[:, :, Hz:Hz + Nz], hi], axis=2)


bench1("fill roll+where + zconcat", fill_roll_where, x0)

# --- 4 fields in one jit (current path) ---
sol0 = state["solution"]
bench1("fill 4 fields (current)", lambda s: model.fill_all_halos(s), sol0)

# --- full step ---
bench1("FULL STEP", lambda s: model.step(s, dtv), state, reps=15)
