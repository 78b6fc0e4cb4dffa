"""Projection accuracy + speed vs the transform matmul precision.

    CLIMA_FFT_PRECISION={highest|high} python benchmark/fft_precision.py [N]

Reports steady-state step time and the post-projection divergence
residual max|div(u)| / max|u| after 10 steps — the metric the pressure
solve exists to drive to zero. Run once per precision (the env var is
read at solver import)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.ops import operators as op

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
grid = model.grid
key = jax.random.PRNGKey(0)
ku, kv = jax.random.split(key)
state = model.initial_state(
    u=1e-2 * jax.random.normal(ku, grid.shape, grid.dtype),
    v=1e-2 * jax.random.normal(kv, grid.shape, grid.dtype))
dt = jnp.float32(1e-4)
step = jax.jit(model.step, donate_argnums=0)
state = step(state, dt)
state = step(state, dt)
sol = state["solution"]
print("compiled", flush=True)
float(jnp.asarray(sol["u"]).ravel()[0])
t0 = time.perf_counter()
for _ in range(10):
    state = step(state, dt)
sol = state["solution"]
float(jnp.asarray(sol["u"]).ravel()[0])
ms = (time.perf_counter() - t0) / 10 * 1e3
div = grid.interior(op.div_ccc(sol["u"], sol["v"], sol["w"], grid))
rel = float(jnp.max(jnp.abs(div))) * float(grid._axes[0].extent / n) \
    / float(jnp.max(jnp.abs(sol["u"])))
print(f"precision={os.environ.get('CLIMA_FFT_PRECISION', 'highest')}  "
      f"{ms:.2f} ms/step  max|div|*dx/max|u| = {rel:.3e}", flush=True)
