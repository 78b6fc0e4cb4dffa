"""Analytic-solution dynamics tests (model: /root/reference/test/test_dynamics.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, ScalarDiffusivity,
    CenteredSecondOrder, FPlane,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer


def test_cosine_diffusion_against_analytic_solution():
    """c(x,0)=cos(x) diffuses as e^{-κt}cos(x) (reference test_dynamics.jl:76-79)."""
    n, kappa = 64, 1.0
    g = RectilinearGrid(size=(n, 1, 1), x=(0, 2 * np.pi), y=(0, 1),
                        topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g, tracers=("c",),
                                closure=ScalarDiffusivity(nu=0.0, kappa=kappa),
                                timestepper="RungeKutta3")
    g = model.grid
    state = model.initial_state(c=lambda x, y, z: jnp.cos(x))
    dt = 1e-4
    step = jax.jit(model.step)
    for _ in range(100):
        state = step(state, jnp.float64(dt))
    t = float(state["clock"].time)
    x = np.asarray(g.coord(0, "c"))
    # discrete decay rate: λ = (2 sin(Δ/2)/Δ)² for the 2nd-order laplacian
    dx = 2 * np.pi / n
    lam = (2 * np.sin(dx / 2) / dx) ** 2
    expected = np.exp(-kappa * lam * t) * np.cos(x)
    got = np.asarray(g.interior(state["solution"]["c"]))[:, 0, 0]
    assert np.allclose(got, expected, atol=1e-6)


def test_taylor_green_vortex():
    """2D Taylor-Green: u = −cos x sin y e^{−2νt}, exact for the incompressible
    equations; checks advection + projection + diffusion together
    (reference test_dynamics.jl:219-244)."""
    n, nu = 64, 1e-2
    g = RectilinearGrid(size=(n, n, 1), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g, closure=ScalarDiffusivity(nu=nu),
                                advection=CenteredSecondOrder(),
                                timestepper="RungeKutta3")
    g = model.grid
    u0 = lambda x, y, z: -jnp.cos(x) * jnp.sin(y)
    v0 = lambda x, y, z: jnp.sin(x) * jnp.cos(y)
    state = model.initial_state(u=u0, v=v0)
    dt, nsteps = 1e-3, 200
    step = jax.jit(model.step)
    for _ in range(nsteps):
        state = step(state, jnp.float64(dt))
    t = float(state["clock"].time)
    from clima_oceananigans_jl_tpu import U_LOC
    xs = np.asarray(g.coord(0, U_LOC[0]))
    ys = np.asarray(g.coord(1, U_LOC[1]))
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    dx = 2 * np.pi / n
    lam = (2 * np.sin(dx / 2) / dx) ** 2  # discrete diffusion eigenvalue
    expected = -np.cos(X) * np.sin(Y) * np.exp(-2 * nu * lam * t)
    got = np.asarray(g.interior(state["solution"]["u"]))[:, :, 0]
    err = np.max(np.abs(got - expected))
    assert err < 2e-3  # advection truncation error at n=64


def test_internal_wave_remains_bounded_and_oscillates():
    """Linear internal-wave-ish sanity: stratified fluid with small
    perturbation stays bounded with AB2 + buoyancy + projection."""
    n = 16
    g = RectilinearGrid(size=(n, 1, n), x=(0, 2 * np.pi), y=(0, 1), z=(-np.pi, 0),
                        topology=(PERIODIC, FLAT, BOUNDED), dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g, buoyancy=BuoyancyTracer(), tracers=("b",))
    g = model.grid
    N2 = 1.0
    state = model.initial_state(
        b=lambda x, y, z: N2 * z + 1e-6 * jnp.sin(x) * jnp.sin(z),
        u=lambda x, y, z: 1e-6 * jnp.sin(x) * jnp.sin(z))
    step = jax.jit(model.step)
    for _ in range(100):
        state = step(state, jnp.float64(1e-2))
    for k in ("u", "v", "w", "b"):
        arr = np.asarray(g.interior(state["solution"][k]))
        assert np.all(np.isfinite(arr))
    w = np.asarray(g.interior(state["solution"]["w"]))
    assert np.abs(w).max() < 1e-3  # perturbation stays linear


def test_ab2_euler_first_step_then_ab2():
    g = RectilinearGrid(size=(8, 8, 1), extent=(1, 1),
                        x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g, tracers=("c",),
                                closure=ScalarDiffusivity(kappa=0.1))
    state = model.initial_state(c=lambda x, y, z: jnp.sin(2 * np.pi * x))
    step = jax.jit(model.step)
    s1 = step(state, jnp.float64(1e-3))
    s2 = step(s1, jnp.float64(1e-3))
    assert int(s2["clock"].iteration) == 2
    assert np.all(np.isfinite(np.asarray(s2["solution"]["c"])))


def test_rotation_inertial_oscillation():
    """f-plane with uniform flow: u² + v² conserved, rotating at frequency f."""
    g = RectilinearGrid(size=(4, 4, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    f = 1.0
    model = NonhydrostaticModel(grid=g, coriolis=FPlane(f=f), advection=None)
    g = model.grid
    state = model.initial_state(u=1.0, v=0.0)
    dt, nsteps = 1e-3, 1000
    step = jax.jit(model.step)
    for _ in range(nsteps):
        state = step(state, jnp.float64(dt))
    t = nsteps * dt
    u = float(np.mean(np.asarray(g.interior(state["solution"]["u"]))))
    v = float(np.mean(np.asarray(g.interior(state["solution"]["v"]))))
    assert np.isclose(u, np.cos(f * t), atol=2e-3)
    assert np.isclose(v, -np.sin(f * t), atol=2e-3)


def test_internal_wave_dispersion_relation():
    """Measured internal-wave frequency matches ω² = N²k²/(k²+m²)
    (reference test_dynamics.jl internal-wave solution comparison — an
    independent analytic target, not a framework-generated golden)."""
    n = 32
    N2 = 1.0
    kx, mz = 1.0, 2.0  # wavenumbers on x ∈ [0, 2π], z ∈ [-π, 0]
    g = RectilinearGrid(size=(n, 1, n), x=(0, 2 * np.pi), y=(0, 1),
                        z=(-np.pi, 0.0),
                        topology=(PERIODIC, FLAT, BOUNDED), dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g, buoyancy=BuoyancyTracer(),
                                tracers=("b",), advection=None,
                                timestepper="RungeKutta3")
    g = model.grid
    a = 1e-9
    # w eigenmode: w = a sin(kx x) sin(mz z) (zero at both walls)
    state = model.initial_state(
        b=lambda x, y, z: N2 * z,
        w=lambda x, y, z: a * jnp.sin(kx * x) * jnp.sin(mz * z))
    omega = np.sqrt(N2 * kx**2 / (kx**2 + mz**2))
    period = 2 * np.pi / omega
    dt = period / 400
    step = jax.jit(model.step)
    amps = []
    for i in range(400):
        state = step(state, jnp.float64(dt))
        w = np.asarray(g.interior(state["solution"]["w"]))[:, 0, :]
        # project onto the eigenmode
        xs = np.asarray(g.coord(0, "c"))
        zs = np.asarray(g.coord(2, "f"))[: w.shape[1]]
        mode = np.sin(kx * xs)[:, None] * np.sin(mz * zs)[None, :]
        amps.append((w * mode).sum() / (mode * mode).sum())
    amps = np.array(amps) / a
    # count zero crossings over one analytic period: expect 2
    crossings = np.where(np.diff(np.sign(amps)) != 0)[0]
    assert len(crossings) >= 2, amps[:20]
    # measured half-period from the first two crossings
    half = (crossings[1] - crossings[0]) * dt
    omega_meas = np.pi / half
    assert abs(omega_meas - omega) / omega < 0.05, (omega_meas, omega)


def test_hydrostatic_geostrophic_balance_is_steady():
    """An exactly balanced jet (f v = g ∂x η) on the f-plane stays put —
    the geostrophic-adjustment end state (reference
    test_hydrostatic_free_surface_models.jl geostrophic checks)."""
    from clima_oceananigans_jl_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel)
    from clima_oceananigans_jl_tpu.models.free_surface import (
        ImplicitFreeSurface)
    L, H, f0, g0 = 1e6, 1000.0, 1e-4, 9.80665
    n = 32
    grid = RectilinearGrid(size=(n, n, 4), x=(0, L), y=(0, L), z=(-H, 0),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    k = 2 * np.pi / L
    eta0 = 0.1
    model = HydrostaticFreeSurfaceModel(
        grid=grid, coriolis=FPlane(f=f0),
        free_surface=ImplicitFreeSurface(solver_method="fft"),
        momentum_advection=None)
    state = model.initial_state(
        eta=lambda x, y: eta0 * jnp.sin(k * x),
        v=lambda x, y, z: (g0 / f0) * eta0 * k * jnp.cos(k * x))
    gi = model.grid
    v_init = np.asarray(gi.interior(state["solution"]["v"]))
    dt = jnp.float64(600.0)  # ~17 inertial periods total
    step = jax.jit(model.step)
    for _ in range(100):
        state = step(state, dt)
    v_fin = np.asarray(gi.interior(state["solution"]["v"]))
    u_fin = np.asarray(gi.interior(state["solution"]["u"]))
    drift = np.abs(v_fin - v_init).max() / np.abs(v_init).max()
    assert drift < 0.05, drift
    assert np.abs(u_fin).max() < 0.05 * np.abs(v_init).max()


def test_inviscid_kinetic_energy_conservation():
    """Centered-2 advection + projection conserves KE spatially (mimetic
    discretization); with RK3 the only drift is O(Δt³) time truncation
    (reference's energy-conserving discretization property)."""
    n = 32
    g = RectilinearGrid(size=(n, n, 1), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g, advection=CenteredSecondOrder(),
                                timestepper="RungeKutta3")
    g = model.grid
    key = jax.random.PRNGKey(21)
    k1, k2 = jax.random.split(key)
    state = model.initial_state(
        u=jax.random.normal(k1, g.shape, jnp.float64),
        v=jax.random.normal(k2, g.shape, jnp.float64))

    def ke(s):
        u = np.asarray(g.interior(s["solution"]["u"]))
        v = np.asarray(g.interior(s["solution"]["v"]))
        return float((u * u + v * v).sum())

    e0 = ke(state)   # post-projection (initial_state projects? measure after 1)
    step = jax.jit(model.step)
    state = step(state, jnp.float64(1e-3))
    e1 = ke(state)
    for _ in range(200):
        state = step(state, jnp.float64(1e-3))
    e2 = ke(state)
    drift = abs(e2 - e1) / e1
    assert drift < 2e-4, drift


def test_enstrophy_conserving_coriolis_and_advection():
    """The enstrophy-conserving vector-invariant scheme keeps 2D
    enstrophy Z = ∫ζ² drift at time-truncation level in inviscid flow
    (reference EnstrophyConservingScheme property)."""
    from clima_oceananigans_jl_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel)
    from clima_oceananigans_jl_tpu.models.free_surface import (
        ImplicitFreeSurface)
    from clima_oceananigans_jl_tpu.advection.vector_invariant import (
        VectorInvariant)
    from clima_oceananigans_jl_tpu.ops.operators import zeta3_ffc

    n = 32
    g = RectilinearGrid(size=(n, n, 1), x=(0, 1e5), y=(0, 1e5), z=(-10.0, 0),
                        topology=(PERIODIC, PERIODIC, BOUNDED),
                        dtype=jnp.float64)
    model = HydrostaticFreeSurfaceModel(
        grid=g, coriolis=FPlane(f=1e-4),
        momentum_advection=VectorInvariant(scheme="enstrophy"),
        free_surface=ImplicitFreeSurface(solver_method="fft"))
    g = model.grid
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    state = model.initial_state(
        u=0.1 * jax.random.normal(k1, g.shape, jnp.float64),
        v=0.1 * jax.random.normal(k2, g.shape, jnp.float64))

    def enstrophy(s):
        sol = s["solution"]
        from clima_oceananigans_jl_tpu.boundary_conditions.bcs import fill_halos
        u = fill_halos(sol["u"], g, model._locs()["u"], model.bcs["u"])
        v = fill_halos(sol["v"], g, model._locs()["v"], model.bcs["v"])
        z = np.asarray(g.interior(zeta3_ffc(u, v, g)))
        return float((z * z).sum())

    step = jax.jit(model.step)
    state = step(state, jnp.float64(20.0))
    z1 = enstrophy(state)
    for _ in range(100):
        state = step(state, jnp.float64(20.0))
    z2 = enstrophy(state)
    drift = abs(z2 - z1) / z1
    assert drift < 5e-3, drift
