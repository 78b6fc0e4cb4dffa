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
    ph = state.get("pHY") if model.buoyancy is not None else None
    Gf = fused_hydrostatic_tendencies(model, state, interpret=True)
    Gj = hydrostatic_advective_core(g, model.momentum_advection,
                                    model.tracer_advection, model.coriolis,
                                    model.tracer_names, sol["u"], sol["v"],
                                    state["w"], tr, pHY=ph)
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
