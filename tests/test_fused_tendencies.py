"""Fused Pallas advective tendencies ≡ the jnp stencil path (interpret
mode on CPU; the TPU bench uses the compiled kernel)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_zslim_fused_matches_jnp_periodic_z():
    """z-halo-free blocks (z_slim): bit-exact on periodic z — the
    in-block roll wrap IS the periodic condition."""
    from clima_oceananigans_jl_tpu.ops.fused_tendencies import z_halo_free_ok

    grid = RectilinearGrid(size=(16, 16, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, PERIODIC),
                           halo=(3, 4, 3), dtype=jnp.float64)
    assert z_halo_free_ok(grid)
    scheme = WENO5()
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float64) for k in ks)
    from clima_oceananigans_jl_tpu.boundary_conditions.bcs import fill_halos
    from clima_oceananigans_jl_tpu.utils.location import U_LOC, V_LOC, W_LOC, CENTER
    u = fill_halos(u, grid, U_LOC); v = fill_halos(v, grid, V_LOC)
    w = fill_halos(w, grid, W_LOC); c = fill_halos(c, grid, CENTER)
    slim = fused_advective_tendencies(grid, scheme, CenteredSecondOrder(),
                                      u, v, w, {"c": c}, interpret=True,
                                      z_slim=True)
    full = fused_advective_tendencies(grid, scheme, CenteredSecondOrder(),
                                      u, v, w, {"c": c}, interpret=True,
                                      z_slim=False)
    ref = dict(u=-div_vu(grid, scheme, u, v, w),
               v=-div_vv(grid, scheme, u, v, w),
               w=-div_vw(grid, scheme, u, v, w),
               c=-div_Uc(grid, CenteredSecondOrder(), u, v, w, c))
    for name in ("u", "v", "w", "c"):
        a = np.asarray(grid.interior(slim[name]))
        b = np.asarray(grid.interior(full[name]))
        assert np.array_equal(a, b), name  # bitwise vs the with-halo kernel
        r = np.asarray(grid.interior(ref[name]))
        assert np.allclose(a, r, atol=1e-12), name


def test_zslim_fused_matches_jnp_bounded_z():
    """z_slim on bounded z with impenetrable walls: interiors bit-match
    the jnp path except G_w at the bottom wall face (k=0) — the
    documented exception, overwritten by the projection before any read
    (the full-step bitwise test below covers that end-to-end)."""
    from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (
        default_bcs, fill_halos)
    from clima_oceananigans_jl_tpu.ops.fused_tendencies import z_halo_free_ok
    from clima_oceananigans_jl_tpu.utils.location import (U_LOC, V_LOC,
                                                          W_LOC, CENTER)

    grid = RectilinearGrid(size=(16, 16, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           halo=(3, 4, 3), dtype=jnp.float64)
    w_bcs = default_bcs(grid, W_LOC)
    assert z_halo_free_ok(grid, w_bcs)
    scheme = WENO5()
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float64) for k in ks)
    u = fill_halos(u, grid, U_LOC); v = fill_halos(v, grid, V_LOC)
    w = fill_halos(w, grid, W_LOC, w_bcs); c = fill_halos(c, grid, CENTER)
    slim = fused_advective_tendencies(grid, scheme, CenteredSecondOrder(),
                                      u, v, w, {"c": c}, interpret=True,
                                      z_slim=True)
    full = fused_advective_tendencies(grid, scheme, CenteredSecondOrder(),
                                      u, v, w, {"c": c}, interpret=True,
                                      z_slim=False)
    ref = dict(u=-div_vu(grid, scheme, u, v, w),
               v=-div_vv(grid, scheme, u, v, w),
               w=-div_vw(grid, scheme, u, v, w),
               c=-div_Uc(grid, CenteredSecondOrder(), u, v, w, c))
    for name in ("u", "v", "w", "c"):
        a = np.asarray(grid.interior(slim[name]))
        b = np.asarray(grid.interior(full[name]))
        r = np.asarray(grid.interior(ref[name]))
        if name == "w":
            a, b, r = a[:, :, 1:], b[:, :, 1:], r[:, :, 1:]
        assert np.array_equal(a, b), name  # bitwise vs the with-halo kernel
        assert np.allclose(a, r, atol=1e-12), name


def test_zslim_dma_variant_matches():
    """The Z_SLIM_DMA layout (input windows carry nz lanes at Element
    offset hz — the DMA realigns instead of an in-kernel slice) must be
    bit-identical to the in-kernel-slice variant. Needs nz % 128 == 0."""
    import clima_oceananigans_jl_tpu.ops.fused_tendencies as ft

    grid = RectilinearGrid(size=(8, 8, 128), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    scheme = WENO5()
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float64) for k in ks)
    outs = {}
    for dma in (False, True):
        ft.Z_SLIM_DMA = dma
        try:
            outs[dma] = fused_advective_tendencies(
                grid, scheme, CenteredSecondOrder(), u, v, w, {"c": c},
                interpret=True, z_slim=True)
        finally:
            ft.Z_SLIM_DMA = False
    for name in ("u", "v", "w", "c"):
        a = np.asarray(outs[True][name])
        b = np.asarray(outs[False][name])
        assert np.array_equal(a, b), name


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


def test_fused_stretched_z_matches_jnp():
    """Stretched-z fused kernel (metric-pack Δz rows + in-kernel stretched
    WENO tables, reference weno_fifth_order.jl:33-60): interiors match the
    jnp path to ~ulp, and the gate now admits hregular grids."""
    zf = [-100.0 * (1 - (k / 8.0) ** 1.6) for k in range(9)]
    grid = RectilinearGrid(size=(16, 16, 8), x=(0, 1.0), y=(0, 1.0), z=zf,
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           halo=(3, 4, 3), dtype=jnp.float64)
    assert not grid.z_regular and supports_fused_advection(grid)
    scheme = WENO5()
    from clima_oceananigans_jl_tpu.boundary_conditions.bcs import fill_halos
    from clima_oceananigans_jl_tpu.utils.location import (U_LOC, V_LOC,
                                                          W_LOC, CENTER)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    u, v, w, c = (jax.random.normal(k, grid.total_shape, jnp.float64)
                  for k in ks)
    u = fill_halos(u, grid, U_LOC); v = fill_halos(v, grid, V_LOC)
    w = fill_halos(w, grid, W_LOC); c = fill_halos(c, grid, CENTER)
    fused = fused_advective_tendencies(grid, scheme, WENO5(),
                                       u, v, w, {"c": c}, interpret=True)
    ref = dict(u=-div_vu(grid, scheme, u, v, w),
               v=-div_vv(grid, scheme, u, v, w),
               w=-div_vw(grid, scheme, u, v, w),
               c=-div_Uc(grid, WENO5(), u, v, w, c))
    for name in ("u", "v", "w", "c"):
        a = np.asarray(grid.interior(fused[name]))
        b = np.asarray(grid.interior(ref[name]))
        assert np.allclose(a, b, atol=1e-12), (name, np.abs(a - b).max())


def test_fused_step_stretched_z_model_equivalence():
    """Full nonhydrostatic AB2 steps on a stretched-z grid: fused path
    (advection kernel + Fourier-tridiagonal projection) ≡ jnp path."""
    import os
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
    zf = [-100.0 * (1 - (k / 8.0) ** 1.6) for k in range(9)]
    grid = RectilinearGrid(size=(16, 16, 8), x=(0, 1e3), y=(0, 1e3), z=zf,
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    kw = dict(advection=WENO5(), buoyancy=BuoyancyTracer(), tracers=("c",))
    m_f = NonhydrostaticModel(grid, fused_advection=True, **kw)
    m_j = NonhydrostaticModel(grid, fused_advection=False, **kw)
    assert m_f.fused_advection and not m_j.fused_advection
    key = jax.random.PRNGKey(11)
    ku, kv, kb = jax.random.split(key, 3)
    vals = dict(u=0.01 * jax.random.normal(ku, grid.shape, jnp.float64),
                v=0.01 * jax.random.normal(kv, grid.shape, jnp.float64),
                b=1e-5 * jax.random.normal(kb, grid.shape, jnp.float64))
    s_f, s_j = m_f.initial_state(**vals), m_j.initial_state(**vals)
    step_f, step_j = jax.jit(m_f.step), jax.jit(m_j.step)
    for _ in range(4):
        s_f = step_f(s_f, 1.0)
        s_j = step_j(s_j, 1.0)
    for n in ("u", "v", "w", "b"):
        a = np.asarray(m_f.grid.interior(s_f["solution"][n]))
        b = np.asarray(m_j.grid.interior(s_j["solution"][n]))
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-12 * scale, n


@pytest.mark.parametrize("cor", ["fplane", "betaplane"])
def test_fused_ab2_step_with_coriolis_bitwise(cor):
    """Coriolis folded INTO the fused AB2 kernel (f-plane / β-plane):
    multi-step solutions must stay bit-identical to the plain path."""
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    from clima_oceananigans_jl_tpu.coriolis.coriolis import BetaPlane, FPlane
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)

    coriolis = (FPlane(f=1e-4) if cor == "fplane"
                else BetaPlane(f0=1e-4, beta=1e-11))
    n = 16
    sols = {}
    for fused in (True, False):
        grid = RectilinearGrid(size=(n, n, n), extent=(1., 1., 1.),
                               topology=(PERIODIC, PERIODIC, BOUNDED),
                               dtype=jnp.float64)
        m = NonhydrostaticModel(grid, advection=WENO5(),
                                buoyancy=BuoyancyTracer(), coriolis=coriolis,
                                fused_advection=fused)
        assert m.fused_step == fused
        key = jax.random.PRNGKey(2)
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


@pytest.mark.parametrize("td,zspec", [
    ("explicit", "regular"), ("vertically_implicit", "regular"),
    ("explicit", "stretched")])
def test_fused_ab2_step_with_scalar_diffusivity(td, zspec):
    """Constant-coefficient ScalarDiffusivity folded INTO the fused AB2
    advance (_step_kernel_closure/_diffusion_block): full steps match the
    plain path. Covers the z_slim wall-face flux zeroing (regular z — the
    blocks carry no z ghosts, the wall flux is reconstructed as the exact
    0 the XLA mirror fill produces) and the full-z-window stretched path.
    Reference: the GPU tendency kernel adds ∂ⱼτᵢⱼ in the same launch
    (nonhydrostatic_tendency_kernel_functions.jl:66-74)."""
    from clima_oceananigans_jl_tpu import ScalarDiffusivity
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    from clima_oceananigans_jl_tpu.coriolis.coriolis import FPlane
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)

    z = ((-1.0, 0.0) if zspec == "regular"
         else [-100.0 * (1 - (k / 8.0) ** 1.6) for k in range(9)])
    cl = ScalarDiffusivity(nu=1e-3, kappa={"c": 1e-4},
                           time_discretization=td)
    sols = {}
    for fused in (True, False):
        grid = RectilinearGrid(size=(16, 16, 8), x=(0, 1.), y=(0, 1.), z=z,
                               topology=(PERIODIC, PERIODIC, BOUNDED),
                               dtype=jnp.float64)
        m = NonhydrostaticModel(grid, advection=WENO5(),
                                buoyancy=BuoyancyTracer(), tracers=("c",),
                                closure=cl, coriolis=FPlane(f=1e-4),
                                fused_advection=fused)
        if fused:
            assert m.fused_step, "closure should keep the fused-step gate open"
        key = jax.random.PRNGKey(2)
        ku, kv, kb = jax.random.split(key, 3)
        s = m.initial_state(
            u=1e-2 * jax.random.normal(ku, grid.shape, grid.dtype),
            v=1e-2 * jax.random.normal(kv, grid.shape, grid.dtype),
            b=1e-5 * jax.random.normal(kb, grid.shape, grid.dtype),
            c=jax.random.normal(kb, grid.shape, grid.dtype))
        step = jax.jit(m.step)
        for _ in range(4):
            s = step(s, 1e-3)
        sols[fused] = (m, s)
    mf, sf = sols[True]
    mj, sj = sols[False]
    for n in ("u", "v", "w", "b", "c"):
        a = np.asarray(mf.grid.interior(sf["solution"][n]))
        b = np.asarray(mj.grid.interior(sj["solution"][n]))
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-12 * scale, n


def test_fused_step_gate_rejects_inexpressible_closures():
    from clima_oceananigans_jl_tpu import ScalarDiffusivity
    from clima_oceananigans_jl_tpu.closures.eddy_viscosity import SmagorinskyLilly
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    m = NonhydrostaticModel(grid, advection=WENO5(), closure=SmagorinskyLilly(),
                            fused_advection=True)
    assert not m.fused_step  # LES diffusivity fields are not kernel scalars
    m2 = NonhydrostaticModel(grid, advection=WENO5(),
                             closure=(ScalarDiffusivity(nu=1e-3),
                                      ScalarDiffusivity(kappa=1e-4)),
                             fused_advection=True)
    assert not m2.fused_step  # closure tuples stay on the XLA path
