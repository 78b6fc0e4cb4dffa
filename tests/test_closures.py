"""Turbulence-closure tests (model: /root/reference/test/
test_turbulence_closures.jl 'does it run' matrix + physics sanity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, ScalarDiffusivity,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import ImplicitFreeSurface
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.closures.eddy_viscosity import (
    AnisotropicMinimumDissipation, SmagorinskyLilly, TwoDimensionalLeith,
)
from clima_oceananigans_jl_tpu.closures.vertical_mixing import (
    CATKEVerticalDiffusivity, ConvectiveAdjustmentVerticalDiffusivity,
    RiBasedVerticalDiffusivity,
)
from clima_oceananigans_jl_tpu.closures.isopycnal import (
    FluxTapering, IsopycnalSkewSymmetricDiffusivity,
)


def box_grid(n=16):
    return RectilinearGrid(size=(n, n, n), extent=(1.0, 1.0, 1.0),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)


@pytest.mark.parametrize("closure", [
    SmagorinskyLilly(),
    AnisotropicMinimumDissipation(),
    TwoDimensionalLeith(),
    (SmagorinskyLilly(), ScalarDiffusivity(nu=1e-4, kappa=1e-4)),
])
def test_les_closures_run_nonhydrostatic(closure):
    """'Does it run' matrix over closures (reference test_time_stepping.jl)."""
    g = box_grid()
    model = NonhydrostaticModel(g, closure=closure, buoyancy=BuoyancyTracer(),
                                timestepper="RungeKutta3")
    key = jax.random.PRNGKey(0)
    state = model.initial_state(
        u=1e-2 * jax.random.normal(key, g.shape, jnp.float64),
        b=lambda x, y, z: 1e-4 * z)
    step = jax.jit(model.step)
    for _ in range(3):
        state = step(state, jnp.float64(1e-3))
    assert np.all(np.isfinite(np.asarray(state["solution"]["u"])))


def test_smagorinsky_viscosity_positive_under_shear():
    g = box_grid()
    closure = SmagorinskyLilly()
    u = jnp.broadcast_to(g.coord(2, "c", with_halo=True).reshape(1, 1, -1),
                         g.total_shape)  # du/dz = 1
    fields = dict(u=u, v=jnp.zeros(g.total_shape), w=jnp.zeros(g.total_shape))
    d = closure.compute_diffusivities(g, fields, None, {})
    nu_e = np.asarray(g.interior(d["nu_e"]))
    # ν = (CΔ)²|S|, |S| = √(2·2·(1/2)²) = 1 for pure du/dz = 1 shear
    delta2 = (1 / 16) ** 2
    assert np.allclose(nu_e[:, :, 5], 0.16 ** 2 * delta2 * 1.0, rtol=1e-6)


def test_amd_zero_for_rigid_motion():
    g = box_grid()
    closure = AnisotropicMinimumDissipation()
    fields = dict(u=jnp.full(g.total_shape, 0.3),
                  v=jnp.full(g.total_shape, -0.2),
                  w=jnp.zeros(g.total_shape))
    d = closure.compute_diffusivities(g, fields, None, {})
    assert float(jnp.abs(g.interior(d["nu_e"])).max()) < 1e-12


def column_model(closure, nz=32):
    g = RectilinearGrid(size=(1, 1, nz), x=(0, 1), y=(0, 1), z=(-100.0, 0),
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    return HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ImplicitFreeSurface(solver_method="pcg"),
        momentum_advection=None, tracer_advection=None,
        buoyancy=BuoyancyTracer(), closure=closure)


def test_convective_adjustment_removes_instability():
    model = column_model(ConvectiveAdjustmentVerticalDiffusivity(
        convective_kappa_z=1.0, background_kappa_z=0.0))
    # unstable: buoyancy increasing downward
    state = model.initial_state(b=lambda x, y, z: -1e-4 * (z + 100) / 100)
    step = jax.jit(model.step)
    for _ in range(50):
        state = step(state, jnp.float64(600.0))
    b = np.asarray(model.grid.interior(state["solution"]["b"]))[0, 0]
    # mixed: stratification removed (b nearly uniform)
    assert b.std() < 0.05 * 1e-4
    # stable column is untouched (kappa_background = 0)
    state2 = model.initial_state(b=lambda x, y, z: 1e-4 * (z + 100) / 100)
    s2 = step(state2, jnp.float64(600.0))
    b2 = np.asarray(model.grid.interior(s2["solution"]["b"]))[0, 0]
    b0 = np.asarray(model.grid.interior(state2["solution"]["b"]))[0, 0]
    assert np.allclose(b2, b0, atol=1e-12)


def test_ri_based_mixes_low_richardson():
    closure = RiBasedVerticalDiffusivity()
    g = RectilinearGrid(size=(1, 1, 16), x=(0, 1), y=(0, 1), z=(-100.0, 0),
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    b = jnp.broadcast_to(1e-6 * g.coord(2, "c", with_halo=True).reshape(1, 1, -1),
                         g.total_shape)
    u_shear = jnp.broadcast_to(0.5 * g.coord(2, "c", with_halo=True).reshape(1, 1, -1),
                               g.total_shape)
    d_shear = closure.compute_diffusivities(
        g, dict(u=u_shear, v=jnp.zeros_like(u_shear)), BuoyancyTracer(), {"b": b})
    d_calm = closure.compute_diffusivities(
        g, dict(u=jnp.zeros_like(u_shear), v=jnp.zeros_like(u_shear)),
        BuoyancyTracer(), {"b": b})
    assert float(jnp.max(d_shear["kappa_z"])) > 10 * float(jnp.min(d_calm["kappa_z"]))


def test_catke_adds_tke_tracer_and_grows_under_shear():
    closure = CATKEVerticalDiffusivity()
    model = column_model(closure)
    assert "e" in model.tracer_names
    state = model.initial_state(
        b=lambda x, y, z: 1e-6 * (z + 100) / 100,
        u=lambda x, y, z: 0.2 * (z + 100) / 100,
        e=1e-7)
    e0 = float(jnp.sum(model.grid.interior(state["solution"]["e"])))
    step = jax.jit(model.step)
    for _ in range(20):
        state = step(state, jnp.float64(60.0))
    e = np.asarray(model.grid.interior(state["solution"]["e"]))
    assert np.all(np.isfinite(e))
    assert float(e.sum()) > e0  # shear production injected TKE


def test_gm_redi_flattens_isopycnals():
    """A lateral buoyancy gradient drives GM overturning: tracer variance
    along z should grow as isopycnals slump (eddy transport active)."""
    g = RectilinearGrid(size=(32, 1, 16), x=(0, 1e6), y=(0, 1), z=(-1000.0, 0),
                        topology=(PERIODIC, FLAT, BOUNDED), dtype=jnp.float64)
    closure = IsopycnalSkewSymmetricDiffusivity(
        kappa_skew=1000.0, kappa_symmetric=1000.0,
        slope_limiter=FluxTapering(1e-2))
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ImplicitFreeSurface(solver_method="pcg"),
        momentum_advection=None, tracer_advection=None,
        buoyancy=BuoyancyTracer(), closure=closure, tracers=("c",))
    state = model.initial_state(
        b=lambda x, y, z: 1e-5 * z / 1000 + 1e-6 * jnp.sin(2 * jnp.pi * x / 1e6),
        c=lambda x, y, z: jnp.sin(2 * jnp.pi * x / 1e6))
    step = jax.jit(model.step)
    for _ in range(10):
        state = step(state, jnp.float64(3600.0))
    c = np.asarray(model.grid.interior(state["solution"]["c"]))
    assert np.all(np.isfinite(c))
    # along-isopycnal stirring created vertical structure in c
    assert c.std(axis=2).mean() > 0
    assert np.abs(c).max() < 2.0  # tapering keeps it bounded


def test_catke_stability_scale_matches_reference_formula():
    """sigma(Ri) = sigma_lo + r*(1 + tanh((Ri - Ri_c)/Ri_w)) with the
    LES-calibrated constants (reference mixing_length.jl:182-210)."""
    from clima_oceananigans_jl_tpu.closures.vertical_mixing import (
        CATKEVerticalDiffusivity, MixingLength)
    cl = CATKEVerticalDiffusivity()
    ml = cl.mixing_length
    for ri in (-1.0, 0.0, 1.1, 5.0, 100.0):
        got = float(cl._stability_scale(jnp.float64(ri), ml.Ck_c_lo, ml.Ck_c_r))
        want = 0.35 + 0.05 * (1 + np.tanh((ri - 1.1) / 30.0))
        assert abs(got - want) < 1e-12
    # defaults match the reference table
    assert (ml.Cb_u, ml.Cs_u, ml.Ck_e_r) == (1.55, 5.1, 17.0)
    assert cl.C_diss == 0.81


def test_catke_surface_tke_flux_injects_tke():
    """Qe = -C_D*(Cw_u*ustar^3 + Cw_w*wstar^3) enters the top cell
    (reference surface_TKE_flux.jl:50-77): a wind-forced calm column
    gains TKE at the surface."""
    from clima_oceananigans_jl_tpu.closures.vertical_mixing import (
        CATKEVerticalDiffusivity)
    closure = CATKEVerticalDiffusivity(surface_momentum_flux=(-1e-4, 0.0))
    model = column_model(closure)
    state = model.initial_state(b=lambda x, y, z: 1e-5 * (z + 100) / 100, e=0.0)
    step = jax.jit(model.step)
    for _ in range(5):
        state = step(state, jnp.float64(60.0))
    e = np.asarray(model.grid.interior(state["solution"]["e"]))[0, 0]
    assert np.all(np.isfinite(e))
    assert e[-1] > 1e-9          # TKE injected at the surface cell
    assert e[-1] > 10 * abs(e[0])  # and concentrated near the top


def test_catke_implicit_dissipation_decays_tke():
    """With no shear/stratification/surface flux, dissipation
    -C_D e^{3/2}/l (treated implicitly via Le) decays TKE monotonically
    without overshooting negative."""
    from clima_oceananigans_jl_tpu.closures.vertical_mixing import (
        CATKEVerticalDiffusivity)
    model = column_model(CATKEVerticalDiffusivity())
    state = model.initial_state(b=0.0, e=1e-4)
    e0 = float(np.max(np.asarray(model.grid.interior(state["solution"]["e"]))))
    step = jax.jit(model.step)
    for _ in range(10):
        state = step(state, jnp.float64(600.0))
    e = np.asarray(model.grid.interior(state["solution"]["e"]))
    assert np.all(np.isfinite(e))
    assert float(e.max()) < e0      # decayed
    assert float(e.min()) >= -1e-12  # implicit treatment never overshoots


def test_biharmonic_horizontal_formulation():
    """HorizontalFormulation biharmonic applies ∇h⁴ only (reference
    scalar_biharmonic_diffusivity.jl formulation argument): z-variation
    must produce zero tendency, and the x-mode decays at ν k⁴."""
    from clima_oceananigans_jl_tpu import CENTER
    from clima_oceananigans_jl_tpu.closures.scalar_diffusivity import (
        ScalarBiharmonicDiffusivity, tracer_diffusion)
    from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (
        fill_halos, regularize_bcs)
    n = 32
    g = RectilinearGrid(size=(n, 4, 8), x=(0, 2 * np.pi), y=(0, 1.0),
                        z=(0.0, 1.0), topology=(PERIODIC, PERIODIC, BOUNDED),
                        dtype=jnp.float64)
    x, y, z = g.nodes(CENTER, with_halo=True)
    c = (jnp.sin(2 * x) + jnp.cos(2 * jnp.pi * z)) * jnp.ones(g.total_shape)
    c = fill_halos(c, g, CENTER, regularize_bcs(g, CENTER))
    cl = ScalarBiharmonicDiffusivity(kappa=1.0, formulation="horizontal")
    G = np.asarray(g.interior(tracer_diffusion(c, g, "c", cl)))
    xi = np.asarray(g.coord(0, "c"))
    # −κ kx⁴ sin(2x) with the discrete kx² = (2 sin(kΔ/2)/Δ)²
    dx = 2 * np.pi / n
    k2 = (2 * np.sin(2 * dx / 2) / dx) ** 2
    expected = -(k2 ** 2) * np.sin(2 * xi)
    got_x = G[:, 0, 4]
    # the z-cosine contributes nothing under the horizontal formulation
    assert np.allclose(got_x, expected, atol=1e-10)
    assert np.allclose(G[:, 0, 0], G[:, 0, -1], atol=1e-10)
