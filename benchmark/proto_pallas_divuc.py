"""Prototype: fused WENO tracer flux divergence as a Pallas kernel."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, dataclasses
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.advection.fluxes import div_Uc
from clima_oceananigans_jl_tpu.advection.schemes import transport
from clima_oceananigans_jl_tpu.ops import stencil as st

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
TX = int(sys.argv[2]) if len(sys.argv) > 2 else 16
TY = int(sys.argv[3]) if len(sys.argv) > 3 else 16
H = 3
HY = 4  # y-halo padded so TY+2*HY is a multiple of 8 (TPU sublane tiling)
grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                       topology=(PERIODIC, PERIODIC, PERIODIC), dtype=jnp.float32,
                       halo=(3, 4, 3))
scheme = WENO5()
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float32) for k in ks)


@dataclasses.dataclass(frozen=True)
class ConstGrid:
    ddx: float
    ddy: float
    ddz: float

    def spacing(self, axis, loc):
        return (self.ddx, self.ddy, self.ddz)[axis]

    def dx(self, loc): return self.ddx
    def dy(self, loc): return self.ddy
    def dz(self, loc): return self.ddz
    def Ax(self, loc): return self.ddy * self.ddz
    def Ay(self, loc): return self.ddx * self.ddz
    def Az(self, loc): return self.ddx * self.ddy
    def V(self, loc): return self.ddx * self.ddy * self.ddz


cg = ConstGrid(1.0 / n, 1.0 / n, 1.0 / n)


def kernel(u_ref, v_ref, w_ref, c_ref, o_ref):
    div = div_Uc(cg, scheme, u_ref[:], v_ref[:], w_ref[:], c_ref[:])
    o_ref[:] = div[H:-H, HY:-HY, :]


Zt = n + 2 * H
win = pl.BlockSpec((pl.Element(TX + 2 * H), pl.Element(TY + 2 * HY), pl.Element(Zt)),
                   lambda i, j: (i * TX, j * TY, 0))
out_spec = pl.BlockSpec((TX, TY, Zt), lambda i, j: (i, j, 0))

div_pallas = pl.pallas_call(
    kernel,
    grid=(n // TX, n // TY),
    in_specs=[win, win, win, win],
    out_specs=out_spec,
    out_shape=jax.ShapeDtypeStruct((n, n, Zt), jnp.float32),
)


def bench(name, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)
    return out

ref = bench("jnp div_Uc", lambda *a: div_Uc(grid, scheme, *a), u, v, w, c)
got = bench(f"pallas div_Uc TX={TX} TY={TY}", div_pallas, u, v, w, c)
ref_i = np.asarray(grid.interior(ref))
got_i = np.asarray(got[:, :, H:-H])
print("match:", np.allclose(ref_i, got_i, atol=np.abs(ref_i).max() * 1e-5),
      np.abs(ref_i - got_i).max())
