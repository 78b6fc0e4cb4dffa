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


def test_fused_shallow_water_matches_jnp():
    import copy
    from clima_oceananigans_jl_tpu import FLAT
    from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
    import clima_oceananigans_jl_tpu.ops.fused_tendencies as ft

    grid = RectilinearGrid(size=(16, 16, 1), x=(0, 1), y=(0, 1),
                           topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=10.0,
                              advection=WENO5(), tracers=("c",))
    state = model.initial_state(
        uh=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y),
        h=1.0, c=lambda x, y, z: jnp.sin(2 * jnp.pi * y))
    state = dict(state, solution=model.fill_all_halos(state["solution"]))

    m_jnp = copy.copy(model); m_jnp.fused_advection = False
    m_fused = copy.copy(model); m_fused.fused_advection = True
    # force interpret mode for the CPU test
    orig = ft.pallas_fuse
    ft_interpret = lambda fn, grid, n_out, interpret=None: orig(fn, grid, n_out,
                                                               interpret=True)
    ft.pallas_fuse, saved = ft_interpret, orig
    try:
        G_f = m_fused.tendencies(state)
    finally:
        ft.pallas_fuse = saved
    G_j = m_jnp.tendencies(state)
    for name in ("uh", "vh", "h", "c"):
        a = np.asarray(model.grid.interior(G_f[name]))
        b = np.asarray(model.grid.interior(G_j[name]))
        assert np.allclose(a, b, atol=1e-12), name


def test_fused_shallow_water_ytiled_matches_jnp():
    """The y-tiled 2D layout (production path for ny beyond the Mosaic
    full-row limit) must agree with the jnp path; forced here by
    dropping FULL_ROW_MAX_NY below the grid's ny."""
    import copy
    from clima_oceananigans_jl_tpu import FLAT
    from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
    import clima_oceananigans_jl_tpu.ops.fused_tendencies as ft

    grid = RectilinearGrid(size=(16, 256, 1), x=(0, 1), y=(0, 1),
                           topology=(PERIODIC, PERIODIC, FLAT),
                           dtype=jnp.float64)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=10.0,
                              advection=WENO5(), tracers=("c",))
    state = model.initial_state(
        uh=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y),
        h=1.0, c=lambda x, y, z: jnp.sin(2 * jnp.pi * y))
    state = dict(state, solution=model.fill_all_halos(state["solution"]))

    m_jnp = copy.copy(model); m_jnp.fused_advection = False
    m_fused = copy.copy(model); m_fused.fused_advection = True
    orig = ft.pallas_fuse
    ft_interpret = lambda fn, grid, n_out, interpret=None: orig(fn, grid, n_out,
                                                               interpret=True)
    ft.pallas_fuse, saved = ft_interpret, orig
    old_max = ft.FULL_ROW_MAX_NY
    try:
        ft.FULL_ROW_MAX_NY = 64  # force the y-tiled layout (ty = 128)
        G_f = m_fused.tendencies(state)
    finally:
        ft.pallas_fuse = saved
        ft.FULL_ROW_MAX_NY = old_max
    G_j = m_jnp.tendencies(state)
    for name in ("uh", "vh", "h", "c"):
        a = np.asarray(model.grid.interior(G_f[name]))
        b = np.asarray(model.grid.interior(G_j[name]))
        assert np.allclose(a, b, atol=1e-12), name


def test_fused_ab2_step_matches_plain_path_bitwise():
    """The fused AB2 advance (tendencies + pHY' gradient + substep in one
    Pallas pass, ops/fused_step.py) must reproduce the plain
    tendencies() → ab2_substep() step on the interior — including the
    Euler first step and the AB2 history — over several steps."""
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)

    n = 16
    sols = {}
    for fused in (True, False):
        grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                               topology=(PERIODIC, PERIODIC, BOUNDED),
                               dtype=jnp.float64)
        m = NonhydrostaticModel(grid, advection=WENO5(),
                                buoyancy=BuoyancyTracer(),
                                timestepper="QuasiAdamsBashforth2",
                                fused_advection=fused)
        assert m.fused_step == fused
        key = jax.random.PRNGKey(0)
        ku, kv, kb = jax.random.split(key, 3)
        s = m.initial_state(
            u=1e-2 * jax.random.normal(ku, grid.shape, grid.dtype),
            v=1e-2 * jax.random.normal(kv, grid.shape, grid.dtype),
            b=1e-4 * jax.random.normal(kb, grid.shape, grid.dtype))
        step = jax.jit(m.step)
        for _ in range(3):
            s = step(s, jnp.float64(1e-3))
        sols[fused] = {k: np.asarray(m.grid.interior(v))
                       for k, v in s["solution"].items()}
    for k in sols[True]:
        assert np.array_equal(sols[True][k], sols[False][k]), k
