"""HydrostaticFreeSurfaceModel tests
(model: /root/reference/test/test_hydrostatic_free_surface_models.jl,
test_implicit_free_surface_solver.jl, test_split_explicit_free_surface_solver.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, ScalarDiffusivity,
    CenteredSecondOrder,
)
from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.coriolis.coriolis import (FPlane,
                                                         HydrostaticSphericalCoriolis)
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import (
    ExplicitFreeSurface, ImplicitFreeSurface, SplitExplicitFreeSurface,
)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer


G_EARTH = 9.80665


def channel_grid(nx=64, nz=4, H=10.0, L=1000.0):
    return RectilinearGrid(size=(nx, 1, nz), x=(0, L), y=(0, 1), z=(-H, 0),
                           topology=(PERIODIC, FLAT, BOUNDED), dtype=jnp.float64)


def eta0_fn(L, A=1e-3):
    return lambda x, y: A * jnp.cos(2 * jnp.pi * x / L)


def test_explicit_free_surface_gravity_wave_speed():
    """Standing barotropic wave oscillates at ω = √(gH)·k (kH ≪ 1)."""
    L, H, A = 1000.0, 10.0, 1e-3
    g = channel_grid(nx=64, nz=4, H=H, L=L)
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ExplicitFreeSurface(G_EARTH),
        momentum_advection=None, tracer_advection=None)
    state = model.initial_state(eta=eta0_fn(L, A))
    mg = model.grid
    c = np.sqrt(G_EARTH * H)
    k = 2 * np.pi / L
    period = 2 * np.pi / (c * k)
    nsteps = 200
    dt = jnp.float64(period / nsteps)
    step = jax.jit(model.step)
    for _ in range(nsteps // 2):  # half period: η should flip sign
        state = step(state, dt)
    eta = np.asarray(state["eta"][mg.Hx:mg.Hx + mg.Nx, mg.Hy, 0])
    x = np.asarray(mg.coord(0, "c"))
    expected = -A * np.cos(k * x)
    assert np.allclose(eta, expected, atol=0.05 * A)


def test_implicit_fft_matches_pcg():
    """FFT and CG implicit free-surface solvers agree on the same step
    (reference test_implicit_free_surface_solver.jl cross-check)."""
    L, H = 1000.0, 10.0
    g = channel_grid(nx=32, nz=3, H=H, L=L)
    states = {}
    for method in ("fft", "pcg"):
        model = HydrostaticFreeSurfaceModel(
            grid=g, free_surface=ImplicitFreeSurface(G_EARTH, solver_method=method,
                                                     tolerance=1e-13, maxiter=1000),
            momentum_advection=None)
        state = model.initial_state(eta=eta0_fn(L))
        step = jax.jit(model.step)
        for _ in range(3):
            state = step(state, jnp.float64(5.0))
        states[method] = state
    e1 = np.asarray(states["fft"]["eta"])
    e2 = np.asarray(states["pcg"]["eta"])
    assert np.allclose(e1, e2, atol=1e-9 * np.abs(e1).max())


def test_split_explicit_matches_explicit():
    """Split-explicit η tracks the explicit solution for a linear wave."""
    L, H, A = 1000.0, 10.0, 1e-3
    g = channel_grid(nx=64, nz=4, H=H, L=L)
    c = np.sqrt(G_EARTH * H)
    period = L / c
    nsteps = 40
    dt = jnp.float64(period / nsteps / 4)

    def run(fs):
        model = HydrostaticFreeSurfaceModel(grid=g, free_surface=fs,
                                            momentum_advection=None)
        state = model.initial_state(eta=eta0_fn(L, A))
        mg = model.grid
        step = jax.jit(model.step)
        for _ in range(nsteps):
            state = step(state, dt)
        return np.asarray(state["eta"][mg.Hx:mg.Hx + mg.Nx, mg.Hy, 0])

    e_exp = run(ExplicitFreeSurface(G_EARTH))
    e_se = run(SplitExplicitFreeSurface(G_EARTH, substeps=200))
    assert np.all(np.isfinite(e_se))
    assert np.allclose(e_se, e_exp, atol=0.15 * A)


def test_tracer_conservation_with_free_surface():
    g = RectilinearGrid(size=(16, 16, 8), x=(0, 1), y=(0, 1), z=(-1, 0),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float64)
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ImplicitFreeSurface(G_EARTH),
        momentum_advection=CenteredSecondOrder(),
        tracer_advection=CenteredSecondOrder(), tracers=("c",))
    state = model.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x) * jnp.cos(2 * jnp.pi * y),
        v=lambda x, y, z: -0.1 * jnp.cos(2 * jnp.pi * x) * jnp.sin(2 * jnp.pi * y),
        c=lambda x, y, z: 1.0 + 0.5 * jnp.sin(2 * jnp.pi * x) * jnp.exp(z))
    from clima_oceananigans_jl_tpu import CENTER
    V = jnp.broadcast_to(model.grid.V(CENTER), model.grid.total_shape)
    total0 = float(jnp.sum(model.grid.interior(state["solution"]["c"] * V)))
    step = jax.jit(model.step)
    for _ in range(20):
        state = step(state, jnp.float64(1e-3))
    total = float(jnp.sum(model.grid.interior(state["solution"]["c"] * V)))
    assert abs(total - total0) < 1e-10 * abs(total0)
    assert np.all(np.isfinite(np.asarray(state["solution"]["c"])))


def test_vector_invariant_stable_and_w_diagnosed():
    g = RectilinearGrid(size=(32, 32, 4), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                        z=(-1, 0), topology=(PERIODIC, PERIODIC, BOUNDED),
                        dtype=jnp.float64)
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ImplicitFreeSurface(G_EARTH),
        coriolis=FPlane(f=1e-1), closure=ScalarDiffusivity(nu=1e-3))
    state = model.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(x) * jnp.cos(y),
        v=lambda x, y, z: -0.1 * jnp.cos(x) * jnp.sin(y))
    step = jax.jit(model.step)
    for _ in range(20):
        state = step(state, jnp.float64(1e-2))
    assert np.all(np.isfinite(np.asarray(state["solution"]["u"])))
    # w must be nonzero in the interior (divergent horizontal flow appears as
    # the free surface evolves) but zero at the bottom face
    w = np.asarray(state["w"])
    assert np.all(w[:, :, model.grid.Hz] == 0.0)


def test_latlon_hydrostatic_runs():
    g = LatitudeLongitudeGrid(size=(36, 18, 4), longitude=(0, 360),
                              latitude=(-60, 60), z=(-1000.0, 0),
                              dtype=jnp.float64)
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ImplicitFreeSurface(G_EARTH, solver_method="pcg"),
        coriolis=HydrostaticSphericalCoriolis(),
        buoyancy=BuoyancyTracer(), closure=ScalarDiffusivity(nu=1e3, kappa=1e3))
    state = model.initial_state(
        b=lambda lam, phi, z: 1e-5 * z / 1000.0 + 1e-7 * jnp.sin(jnp.pi * phi / 180.0))
    step = jax.jit(model.step)
    for _ in range(5):
        state = step(state, jnp.float64(600.0))
    for name in ("u", "v", "b"):
        assert np.all(np.isfinite(np.asarray(state["solution"][name]))), name
    assert np.all(np.isfinite(np.asarray(state["eta"])))


def test_weno_vector_invariant_runs_and_tracks_enstrophy_scheme():
    """WENOVectorInvariant analog: stable and close to the enstrophy-
    conserving scheme on a smooth flow."""
    from clima_oceananigans_jl_tpu.advection.vector_invariant import VectorInvariant
    g = RectilinearGrid(size=(32, 32, 4), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                        z=(-1, 0), topology=(PERIODIC, PERIODIC, BOUNDED),
                        dtype=jnp.float64)
    results = {}
    for scheme in ("enstrophy", "weno"):
        model = HydrostaticFreeSurfaceModel(
            grid=g, free_surface=ImplicitFreeSurface(G_EARTH),
            momentum_advection=VectorInvariant(scheme))
        state = model.initial_state(
            u=lambda x, y, z: 0.1 * jnp.sin(x) * jnp.cos(y),
            v=lambda x, y, z: -0.1 * jnp.cos(x) * jnp.sin(y))
        step = jax.jit(model.step)
        for _ in range(10):
            state = step(state, jnp.float64(1e-2))
        results[scheme] = np.asarray(model.grid.interior(state["solution"]["u"]))
    assert np.all(np.isfinite(results["weno"]))
    diff = np.abs(results["weno"] - results["enstrophy"]).max()
    scale = np.abs(results["enstrophy"]).max()
    assert diff < 0.05 * scale  # smooth flow: schemes agree closely


def test_split_explicit_weighted_filter():
    """Custom averaging weights (Hann filter) run and conserve volume;
    uniform default matches the reference's SplitExplicitSettings
    (split_explicit_free_surface.jl:156-158)."""
    from clima_oceananigans_jl_tpu.models.free_surface import (
        SplitExplicitFreeSurface)
    fs = SplitExplicitFreeSurface.with_hann_filter(substeps=20)
    assert abs(sum(fs.velocity_weights) / sum(fs.free_surface_weights) - 1.0) < 1e-12
    g = RectilinearGrid(size=(16, 16, 4), extent=(1e5, 1e5, 100.0),
                        topology=(PERIODIC, PERIODIC, BOUNDED))
    model = HydrostaticFreeSurfaceModel(g, free_surface=fs)
    eta0 = lambda x, y: 0.1 * jnp.exp(-((x - 5e4)**2 + (y - 5e4)**2) / 1e8)
    state = model.initial_state(eta=eta0)
    gg = model.grid
    core = lambda e: e[gg.Hx:gg.Hx + gg.Nx, gg.Hy:gg.Hy + gg.Ny]
    vol0 = float(jnp.sum(core(state["eta"])))
    for _ in range(3):
        state = jax.jit(model.step)(state, 10.0)
    eta = core(state["eta"])
    assert np.isfinite(np.asarray(eta)).all()
    vol1 = float(jnp.sum(eta))
    assert abs(vol1 - vol0) < 1e-8 * max(1.0, abs(vol0)) + 1e-6


def test_weno_vector_invariant_velocity_stencil():
    """WENOVectorInvariant with the VelocityStencil smoothness variant
    (reference weno_fifth_order.jl:405-440, the WENOVectorInvariant
    default): runs stably, differs from the VorticityStencil variant,
    and both collapse to the same reconstruction on smooth flow."""
    import jax
    from clima_oceananigans_jl_tpu.advection.vector_invariant import (
        VectorInvariant)

    grid = RectilinearGrid(size=(24, 24, 2), x=(0, 1e5), y=(0, 1e5),
                           z=(-100.0, 0),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)

    def build(scheme):
        return HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=VectorInvariant(scheme=scheme),
            coriolis=FPlane(f=1e-4))

    u0 = lambda x, y, z: 0.5 / jnp.cosh((y - 5e4) / 1e4) ** 2
    v0 = lambda x, y, z: 1e-2 * jnp.sin(2 * jnp.pi * x / 1e5)
    results = {}
    for scheme in ("weno", "weno_velocity"):
        model = build(scheme)
        state = model.initial_state(u=u0, v=v0)
        step = jax.jit(model.step)
        for _ in range(10):
            state = step(state, jnp.float64(100.0))
        assert bool(jnp.all(jnp.isfinite(state["solution"]["u"]))), scheme
        results[scheme] = np.asarray(
            model.grid.interior(state["solution"]["u"]))
    diff = np.abs(results["weno"] - results["weno_velocity"]).max()
    # different smoothness sources → different nonlinear weights on the
    # sheared jet, but both stay close (same candidates / formal order)
    assert 0.0 < diff < 1e-3, diff
