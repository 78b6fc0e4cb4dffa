"""Fused hydrostatic Pallas tendencies ≡ the jnp path (interpret mode on
CPU; the TPU bench uses the compiled kernel).

The fused kernel and the jnp path share ``hydrostatic_advective_core``
verbatim (the kernel runs it on VMEM blocks through a metric-pack
KernelGrid), so agreement must be at the ulp level — these tests pin
that across the lat-lon flagship configuration space: curvilinear
metrics, spherical/β-plane Coriolis, stretched z (incl. stretched WENO
tables), bounded-y order reduction inside tiled windows, immersed
continents, and all four vector-invariant variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import BOUNDED, PERIODIC, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.advection.vector_invariant import VectorInvariant
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.coriolis.coriolis import (
    BetaPlane, FPlane, HydrostaticSphericalCoriolis)
from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.ops.fused_hydrostatic import (
    fused_hydrostatic_tendencies, hydrostatic_advective_core,
    supports_fused_hydrostatic)


def _latlon(nz=8, z=(-1000.0, 0.0), size=(32, 16)):
    return LatitudeLongitudeGrid(size=size + (nz,), longitude=(0, 360),
                                 latitude=(-60, 60), z=z, dtype=jnp.float64)


def _compare(model, n_steps=0, atol=1e-17):
    """fused_hydrostatic_tendencies vs hydrostatic_advective_core on the
    SAME model/state; absolute tolerance is near-ulp (terms are O(1e-4))."""
    assert model.fused_advection, "fused gate unexpectedly closed"
    g = model.grid
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 2 + len(model.tracer_names))
    vals = dict(u=0.1 * jax.random.normal(ks[0], g.shape, jnp.float64),
                v=0.1 * jax.random.normal(ks[1], g.shape, jnp.float64))
    for i, n in enumerate(model.tracer_names):
        vals[n] = 1e-4 * jax.random.normal(ks[2 + i], g.shape, jnp.float64)
    state = model.initial_state(**vals)
    for _ in range(n_steps):
        state = model.step(state, 60.0)
    sol = state["solution"]
    tr = {n: sol[n] for n in model.tracer_names}
    # under wphy_in_kernel the state carries neither w nor pHY — rebuild
    # both at the XLA level for the jnp reference, so the comparison also
    # pins the kernel's in-window w/pHY against the original path
    w = state.get("w")
    if w is None:
        w = model.compute_w(sol)
    ph = state.get("pHY") if model.buoyancy is not None else None
    if model.buoyancy is not None and ph is None:
        from clima_oceananigans_jl_tpu.boundary_conditions.bcs import fill_halos
        from clima_oceananigans_jl_tpu.buoyancy.buoyancy import (
            hydrostatic_pressure_anomaly)
        from clima_oceananigans_jl_tpu.utils.location import CENTER
        ph = hydrostatic_pressure_anomaly(model.buoyancy, g, tr,
                                          perm=model._perm)
        ph = fill_halos(ph, g, CENTER, model.pressure_bcs, perm=model._perm)
    Gf = fused_hydrostatic_tendencies(model, state, interpret=True)
    Gj = hydrostatic_advective_core(g, model.momentum_advection,
                                    model.tracer_advection, model.coriolis,
                                    model.tracer_names, sol["u"], sol["v"],
                                    w, tr, pHY=ph)
    for n in Gf:
        a = np.asarray(g.interior(Gf[n]))
        b = np.asarray(g.interior(Gj[n]))
        assert np.abs(a - b).max() <= atol, (n, np.abs(a - b).max())


@pytest.mark.parametrize("vi", ["enstrophy", "energy", "weno",
                                "weno_velocity"])
def test_fused_latlon_vector_invariant_variants(vi):
    m = HydrostaticFreeSurfaceModel(
        _latlon(), momentum_advection=VectorInvariant(scheme=vi),
        tracer_advection=WENO5(), tracers=("c",),
        coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
        fused_advection=True)
    _compare(m)


def test_fused_latlon_stretched_z_weno_tables():
    # stretched z exercises per-level Δz rows AND the in-kernel stretched
    # WENO reconstruction tables (reference weno_fifth_order.jl:33-60)
    zf = [-1000.0 * (1 - (k / 8.0) ** 1.7) for k in range(9)]
    m = HydrostaticFreeSurfaceModel(
        _latlon(nz=8, z=zf), tracer_advection=WENO5(), tracers=("c",),
        coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
        fused_advection=True)
    assert not m.grid._axes[2].regular
    _compare(m)


def test_fused_latlon_flux_form_momentum_bounded_y():
    # flux-form WENO momentum on a bounded-latitude shell: exercises the
    # near-boundary order-reduction masks via per-block iota offsets
    m = HydrostaticFreeSurfaceModel(
        _latlon(), momentum_advection=WENO5(), tracer_advection=WENO5(),
        tracers=("c",), coriolis=BetaPlane(f0=1e-4, beta=1e-11),
        fused_advection=True)
    _compare(m)


def test_fused_rectilinear_bounded_xy():
    # bounded x AND y: absolute order-reduction bounds in both tiled axes
    grid = RectilinearGrid(size=(16, 16, 8), x=(0, 1e5), y=(0, 1e5),
                           z=(-100.0, 0.0),
                           topology=(BOUNDED, BOUNDED, BOUNDED),
                           dtype=jnp.float64)
    m = HydrostaticFreeSurfaceModel(
        grid, momentum_advection=WENO5(), tracer_advection=WENO5(),
        tracers=("c",), coriolis=FPlane(f=1e-4), buoyancy=BuoyancyTracer(),
        fused_advection=True)
    _compare(m)


def test_fused_latlon_immersed_continents():
    # immersed bottom topography on the sphere: conditional fluxes read
    # solid-mask blocks in-kernel; halos are auto-widened to buffer+1
    from clima_oceananigans_jl_tpu.immersed.immersed import GridFittedBottom

    def ridge(lam, phi):
        return -1000.0 + 900.0 * jnp.exp(-((lam - 180.0) / 40.0) ** 2)

    m = HydrostaticFreeSurfaceModel(
        _latlon(), tracer_advection=WENO5(), tracers=("c",),
        coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
        immersed_boundary=GridFittedBottom(ridge), fused_advection=True)
    # conditional fluxes read ±(buffer+1) = ±3 → halo 3 keeps them in-window
    assert m.grid.halo[0] >= 3 and m.grid.halo[1] >= 3
    _compare(m)


def test_fused_full_step_equivalence_multistep():
    """End-to-end: 5 steps of the full hydrostatic model (implicit free
    surface) with the fused kernel on vs off are identical to ~ulp."""
    grid = _latlon()
    kw = dict(momentum_advection=VectorInvariant(scheme="weno_velocity"),
              tracer_advection=WENO5(), tracers=("c",),
              coriolis=HydrostaticSphericalCoriolis(),
              buoyancy=BuoyancyTracer())
    m_f = HydrostaticFreeSurfaceModel(grid, fused_advection=True, **kw)
    m_j = HydrostaticFreeSurfaceModel(grid, fused_advection=False, **kw)
    assert m_f.fused_advection and not m_j.fused_advection
    key = jax.random.PRNGKey(3)
    ku, kv, kc = jax.random.split(key, 3)
    vals = dict(u=0.1 * jax.random.normal(ku, grid.shape, jnp.float64),
                v=0.1 * jax.random.normal(kv, grid.shape, jnp.float64),
                b=1e-5 * jax.random.normal(kc, grid.shape, jnp.float64),
                c=jax.random.normal(kc, grid.shape, jnp.float64))
    s_f, s_j = m_f.initial_state(**vals), m_j.initial_state(**vals)
    step_f, step_j = jax.jit(m_f.step), jax.jit(m_j.step)
    for _ in range(5):
        s_f = step_f(s_f, 120.0)
        s_j = step_j(s_j, 120.0)
    for n in ("u", "v", "b", "c"):
        a = np.asarray(m_f.grid.interior(s_f["solution"][n]))
        b = np.asarray(m_j.grid.interior(s_j["solution"][n]))
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-12 * scale, n
    a = np.asarray(s_f["eta"])[m_f.grid.Hx:-m_f.grid.Hx or None,
                               m_f.grid.Hy:-m_f.grid.Hy or None]
    b = np.asarray(s_j["eta"])[m_j.grid.Hx:-m_j.grid.Hx or None,
                               m_j.grid.Hy:-m_j.grid.Hy or None]
    assert np.abs(a - b).max() <= 1e-12 * max(np.abs(b).max(), 1e-30)


def test_fused_gate_rejects_unsupported():
    # conformal cubed-sphere faces / partial cells / stretched λ are out
    from clima_oceananigans_jl_tpu.immersed.immersed import PartialCellBottom
    stretched_lam = LatitudeLongitudeGrid(
        size=(16, 8, 4), longitude=[360 * (k / 16.0) ** 1.2 for k in range(17)],
        latitude=(-60, 60), z=(-100.0, 0.0), dtype=jnp.float64)
    m = HydrostaticFreeSurfaceModel(stretched_lam, fused_advection=True)
    assert not m.fused_advection
    m2 = HydrostaticFreeSurfaceModel(
        _latlon(), immersed_boundary=PartialCellBottom(lambda l, p: -500.0),
        fused_advection=True)
    assert not m2.fused_advection


def test_inkernel_wphy_step_equivalence(monkeypatch):
    """supports_inkernel_wphy: the fused kernel rebuilds w-from-continuity
    and pHY′ on its own VMEM blocks; the state carries neither. Full-step
    equivalence vs the materialized-w/pHY path (CLIMA_NO_INKERNEL_W)."""
    import os

    from clima_oceananigans_jl_tpu.models.free_surface import (
        SplitExplicitFreeSurface)

    zf = [-1000.0 * (1 - (k / 8.0) ** 1.7) for k in range(9)]

    def build():
        return HydrostaticFreeSurfaceModel(
            _latlon(nz=8, z=zf),
            momentum_advection=VectorInvariant(scheme="weno_velocity"),
            tracer_advection=WENO5(), tracers=("T",),
            free_surface=SplitExplicitFreeSurface(substeps=8),
            coriolis=HydrostaticSphericalCoriolis(),
            buoyancy=BuoyancyTracer(), fused_advection=True)

    m1 = build()
    assert m1.wphy_in_kernel, "gate should engage for the flagship config"
    monkeypatch.setenv("CLIMA_NO_INKERNEL_W", "1")
    m0 = build()
    monkeypatch.delenv("CLIMA_NO_INKERNEL_W")
    assert not m0.wphy_in_kernel

    def init(mm):
        return mm.initial_state(
            u=lambda lam, phi, z: 0.05 * jnp.cos(jnp.deg2rad(phi)),
            v=lambda lam, phi, z: 0.01 * jnp.sin(jnp.deg2rad(2 * lam)),
            b=lambda lam, phi, z: 1e-5 * z,
            T=lambda lam, phi, z: 10.0 + 1e-3 * z)

    s1, s0 = init(m1), init(m0)
    assert "w" not in s1 and "pHY" not in s1  # state stays lean
    assert "w" in s0 and "pHY" in s0
    dt = jnp.float64(200.0)
    st1, st0 = jax.jit(m1.step), jax.jit(m0.step)
    for _ in range(3):
        s1 = st1(s1, dt)
        s0 = st0(s0, dt)
    g = m1.grid
    f1, f0 = m1.fields(s1), m0.fields(s0)
    for n in ("u", "v", "T", "b"):
        a = np.asarray(g.interior(f1[n].data))
        b = np.asarray(g.interior(f0[n].data))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-15, err_msg=n)
    # the on-demand w (fields/diagnostics) matches the carried one to
    # reassociation-level precision (in-jit vs out-of-jit rounding)
    a = np.asarray(g.interior(f1["w"].data))
    b = np.asarray(g.interior(f0["w"].data))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-18)
    ts1 = float(m1.cell_advection_timescale(s1))
    ts0 = float(m0.cell_advection_timescale(s0))
    np.testing.assert_allclose(ts1, ts0, rtol=1e-12)


@pytest.mark.parametrize("fs_kind", ["split", "implicit"])
def test_fused_advance_step_equivalence(fs_kind, monkeypatch):
    """supports_fused_hydro_advance: tendencies + the AB2 substep in ONE
    Pallas pass, with G_prev stored x/y-interior in the kernel layout.
    Full-step equivalence vs the two-stage path (CLIMA_NO_FUSED_STEP) for
    both free-surface families (reference quasi_adams_bashforth_2.jl:70-104
    is the substep being fused)."""
    from clima_oceananigans_jl_tpu.models.free_surface import (
        ImplicitFreeSurface, SplitExplicitFreeSurface)

    def build():
        fs = (SplitExplicitFreeSurface(substeps=8) if fs_kind == "split"
              else ImplicitFreeSurface())
        return HydrostaticFreeSurfaceModel(
            _latlon(), momentum_advection=VectorInvariant(scheme="weno"),
            tracer_advection=WENO5(), tracers=("T",), free_surface=fs,
            coriolis=HydrostaticSphericalCoriolis(),
            buoyancy=BuoyancyTracer(), fused_advection=True)

    m1 = build()
    assert m1.fused_advance, "advance gate should engage"
    monkeypatch.setenv("CLIMA_NO_FUSED_STEP", "1")
    m0 = build()
    monkeypatch.delenv("CLIMA_NO_FUSED_STEP")
    assert not m0.fused_advance

    def init(mm):
        return mm.initial_state(
            u=lambda lam, phi, z: 0.05 * jnp.cos(jnp.deg2rad(phi)),
            v=lambda lam, phi, z: 0.01 * jnp.sin(jnp.deg2rad(2 * lam)),
            b=lambda lam, phi, z: 1e-5 * z,
            T=lambda lam, phi, z: 10.0 + 1e-3 * z)

    s1, s0 = init(m1), init(m0)
    g = m1.grid
    # G_prev really is stored interior (z keeps halos)
    assert s1["G_prev"]["u"].shape == (g.Nx, g.Ny, g.total_shape[2])
    assert s0["G_prev"]["u"].shape == g.total_shape
    dt = jnp.float64(200.0)
    st1, st0 = jax.jit(m1.step), jax.jit(m0.step)
    for _ in range(4):
        s1 = st1(s1, dt)
        s0 = st0(s0, dt)
    for n in ("u", "v", "T", "b"):
        a = np.asarray(g.interior(s1["solution"][n]))
        b = np.asarray(g.interior(s0["solution"][n]))
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-13 * scale, n
    a, b = np.asarray(s1["eta"]), np.asarray(s0["eta"])
    assert np.abs(a - b).max() <= 1e-13 * max(np.abs(b).max(), 1e-30)

    # cross-gate G_prev coercion (e.g. a checkpoint moved across
    # backends): halo-shaped G_prev on an advance model is sliced, an
    # interior one on a two-stage model is zero-padded — continuing from
    # the swapped state stays equivalent (G halos are never read)
    s1_on_m0 = jax.jit(m0.step)(dict(s0, G_prev=s1["G_prev"]), dt)
    s0_on_m1 = jax.jit(m1.step)(dict(s1, G_prev=s0["G_prev"]), dt)
    for n in ("u", "v", "T", "b"):
        a = np.asarray(g.interior(s0_on_m1["solution"][n]))
        b = np.asarray(g.interior(s1_on_m0["solution"][n]))
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-13 * scale, n


@pytest.mark.parametrize("td", ["explicit", "vertically_implicit"])
def test_inkernel_scalar_diffusivity(td, monkeypatch):
    """kernel_closure: a constant-coefficient ScalarDiffusivity's explicit
    ν∇²/κ∇² terms run INSIDE the fused kernel (reference adds them in the
    same tendency kernel launch, hydrostatic_free_surface_tendency_
    kernel_functions.jl:34-36); the fused-advance gate stays open. Full
    step vs the XLA-side diffusion path (CLIMA_NO_FUSED disables the
    kernel but keeps the fused halo widths, so states align)."""
    from clima_oceananigans_jl_tpu import ScalarDiffusivity
    from clima_oceananigans_jl_tpu.models.free_surface import (
        SplitExplicitFreeSurface)

    cl = ScalarDiffusivity(nu=1e3, kappa={"T": 1e2}, nu_z=1e-3,
                           kappa_z=1e-4, time_discretization=td)

    def build():
        return HydrostaticFreeSurfaceModel(
            _latlon(), momentum_advection=VectorInvariant(scheme="weno"),
            tracer_advection=WENO5(), tracers=("T",), closure=cl,
            free_surface=SplitExplicitFreeSurface(substeps=8),
            coriolis=HydrostaticSphericalCoriolis(),
            buoyancy=BuoyancyTracer(), fused_advection=True)

    m1 = build()
    assert m1.fused_advance and m1.wphy_in_kernel, \
        "kernel closure should keep the advance/wphy gates open"
    monkeypatch.setenv("CLIMA_NO_FUSED", "1")
    m0 = build()
    monkeypatch.delenv("CLIMA_NO_FUSED")
    assert not m0.fused_advection and m0.grid.halo == m1.grid.halo

    def init(mm):
        return mm.initial_state(
            u=lambda lam, phi, z: 0.05 * jnp.cos(jnp.deg2rad(phi)),
            v=lambda lam, phi, z: 0.01 * jnp.sin(jnp.deg2rad(2 * lam)),
            b=lambda lam, phi, z: 1e-5 * z,
            T=lambda lam, phi, z: 10.0 + 1e-3 * z)

    s1, s0 = init(m1), init(m0)
    st1, st0 = jax.jit(m1.step), jax.jit(m0.step)
    dt = jnp.float64(200.0)
    for _ in range(3):
        s1 = st1(s1, dt)
        s0 = st0(s0, dt)
    for n in ("u", "v", "T", "b"):
        a = np.asarray(m1.grid.interior(s1["solution"][n]))
        b = np.asarray(m0.grid.interior(s0["solution"][n]))
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-13 * scale, n


def test_wphy_in_kernel_with_discrete_flux_bc_rebuilds_w():
    """A discrete-form (field-dependent) flux BC reading fields['w'] must
    work under wphy_in_kernel (the state carries no w — tendencies()
    rebuilds it on demand for the BC evaluation)."""
    from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (
        FieldBCs, FluxBC)

    g = _latlon()
    m = HydrostaticFreeSurfaceModel(
        g, momentum_advection=VectorInvariant(scheme="weno"),
        tracer_advection=WENO5(), tracers=("T",),
        coriolis=HydrostaticSphericalCoriolis(), buoyancy=BuoyancyTracer(),
        fused_advection=True,
        boundary_conditions={"u": FieldBCs(bottom=FluxBC(
            lambda grid, t, fields: -1e-3 * fields["u"]
            * jnp.abs(fields["w"]), discrete=True))})
    assert m.wphy_in_kernel, "gate should stay open for discrete BCs"
    s = m.initial_state(
        u=lambda lam, phi, z: 0.05 * jnp.cos(jnp.deg2rad(phi)),
        b=lambda lam, phi, z: 1e-5 * z)
    s = jax.jit(m.step)(s, jnp.float64(200.0))
    assert np.isfinite(np.asarray(s["solution"]["u"])).all()
