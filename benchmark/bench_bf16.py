import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = 256
for fast in (False, True):
    grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
    model = NonhydrostaticModel(grid, advection=WENO5(fast_bf16=fast),
                                buoyancy=BuoyancyTracer(),
                                timestepper="QuasiAdamsBashforth2")
    state = model.initial_state(u=1e-2 * jax.random.normal(jax.random.PRNGKey(0),
                                                           grid.shape, jnp.float32))
    step = jax.jit(model.step, donate_argnums=0)
    state = step(state, jnp.float32(1e-4)); state = step(state, jnp.float32(1e-4))
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(15):
        state = step(state, jnp.float32(1e-4))
    jax.block_until_ready(state)
    d = (time.perf_counter() - t0) / 15
    print(f"fast_bf16={fast}: {d*1e3:.2f} ms/step -> {n**3/d/1e6:.1f} M pts/s", flush=True)
    del state, step, model
