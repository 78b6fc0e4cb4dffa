import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
print("default_backend:", jax.default_backend(), flush=True)
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = 256
grid0 = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)

for fused in (True, False):
    model = NonhydrostaticModel(grid0, advection=WENO5(), buoyancy=BuoyancyTracer(),
                                timestepper="QuasiAdamsBashforth2",
                                fused_advection=fused)
    print("model.fused_advection =", model.fused_advection, "halo:", model.grid.halo, flush=True)
    state = model.initial_state(u=1e-2 * jax.random.normal(jax.random.PRNGKey(0),
                                                           grid0.shape, jnp.float32))
    step = jax.jit(model.step, donate_argnums=0)
    state = step(state, jnp.float32(1e-4))
    state = step(state, jnp.float32(1e-4))
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(20):
        state = step(state, jnp.float32(1e-4))
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / 20
    print(f"fused={fused}: {dt*1e3:.2f} ms/step -> {n**3/dt/1e6:.1f} M pts/s", flush=True)
    del state, step, model
