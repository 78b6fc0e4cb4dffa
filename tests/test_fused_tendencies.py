"""Fused Pallas advective tendencies ≡ the jnp stencil path (interpret
mode on CPU; the TPU bench uses the compiled kernel)."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid, WENO5, CenteredSecondOrder
from clima_oceananigans_jl_tpu.advection.fluxes import div_Uc, div_vu, div_vv, div_vw
from clima_oceananigans_jl_tpu.ops.fused_tendencies import (
    fused_advective_tendencies, supports_fused_advection,
)


def test_fused_matches_jnp_weno():
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           halo=(3, 4, 3), dtype=jnp.float64)
    assert supports_fused_advection(grid)
    scheme = WENO5()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float64) for k in ks)
    fused = fused_advective_tendencies(grid, scheme, CenteredSecondOrder(),
                                       u, v, w, {"c": c}, interpret=True)
    ref = dict(u=-div_vu(grid, scheme, u, v, w),
               v=-div_vv(grid, scheme, u, v, w),
               w=-div_vw(grid, scheme, u, v, w),
               c=-div_Uc(grid, CenteredSecondOrder(), u, v, w, c))
    for name in ("u", "v", "w", "c"):
        a = np.asarray(grid.interior(fused[name]))
        b = np.asarray(grid.interior(ref[name]))
        assert np.allclose(a, b, atol=1e-12), name
