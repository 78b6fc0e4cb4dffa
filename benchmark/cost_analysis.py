import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float32)
model = NonhydrostaticModel(grid, advection=WENO5(), buoyancy=BuoyancyTracer(),
                            timestepper="QuasiAdamsBashforth2")
state = jax.eval_shape(lambda: model.initial_state())
import numpy as np
state = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), state)
comp = jax.jit(model.step, donate_argnums=0).lower(state, jnp.float32(1e-4)).compile()
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
flops = ca.get("flops", 0); ba = ca.get("bytes accessed", 0)
print(f"flops/step: {flops/1e9:.2f} G  bytes accessed: {ba/1e9:.2f} GB")
print(f"at 820 GB/s -> {ba/820e9*1e3:.1f} ms;  at 1 TFLOP/s -> {flops/1e12*1e3:.1f} ms")
mem = comp.memory_analysis()
print("temp alloc:", getattr(mem, 'temp_size_in_bytes', None))
for k in sorted(ca):
    if k.startswith("bytes accessed") and ca[k] > 1e9:
        pass
