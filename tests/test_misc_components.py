"""Units/logger, nonlinear EOS, prescribed velocities, ensemble vmap,
bounds-preserving WENO (model: assorted reference tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, WENO5,
)
from clima_oceananigans_jl_tpu.utils.units import (
    day, hour, minute, prettytime, kilometer,
)
from clima_oceananigans_jl_tpu.utils.logger import configure_logger
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import SeawaterBuoyancy
from clima_oceananigans_jl_tpu.buoyancy.nonlinear_eos import (
    PolynomialEquationOfState, RoquetIdealizedEquationOfState,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.models.prescribed import (
    PrescribedVelocityFields, PrescribedVelocityModel,
)
from clima_oceananigans_jl_tpu.models.ensemble import (
    ensemble_initial_state, ensemble_step, member,
)
from clima_oceananigans_jl_tpu.advection.schemes import BoundsPreservingWENO5


def test_units_and_prettytime():
    assert day == 24 * hour and hour == 60 * minute and kilometer == 1000.0
    assert prettytime(90) == "1.500 minutes"
    assert "hours" in prettytime(2 * hour)
    assert "ms" in prettytime(5e-3)
    configure_logger()


def test_nonlinear_eos_cabbeling():
    eos = RoquetIdealizedEquationOfState()
    # mixing two water masses of equal density must be denser (cabbeling)
    T1, T2, S, z = 5.0, 15.0, 35.0, -100.0
    r1 = eos.density_anomaly(T1, S, z)
    r2 = eos.density_anomaly(T2, S, z)
    rmix = eos.density_anomaly(0.5 * (T1 + T2), S, z)
    assert rmix > 0.5 * (r1 + r2)
    poly = PolynomialEquationOfState.from_dict({(1, 0, 0): -0.2, (0, 1, 0): 0.8})
    assert np.isclose(poly.density_anomaly(2.0, 1.0, 0.0), -0.4 + 0.8)


def test_nonlinear_eos_in_model_runs():
    g = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float64)
    model = NonhydrostaticModel(
        g, buoyancy=SeawaterBuoyancy(
            equation_of_state=RoquetIdealizedEquationOfState()))
    state = model.initial_state(T=lambda x, y, z: 12.0 + z, S=35.0)
    step = jax.jit(model.step)
    for _ in range(3):
        state = step(state, jnp.float64(1e-3))
    assert np.all(np.isfinite(np.asarray(state["solution"]["T"])))


def test_prescribed_velocity_tracer_advection():
    g = RectilinearGrid(size=(32, 1, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
    vel = PrescribedVelocityFields(u=lambda x, y, z, t: 1.0 + 0 * x)
    model = PrescribedVelocityModel(g, vel, tracers=("c",),
                                    tracer_advection=WENO5())
    state = model.initial_state(c=lambda x, y, z: jnp.exp(
        -((x - 0.5) ** 2) / 0.01))
    step = jax.jit(model.step)
    n, dt = 100, 1e-3
    for _ in range(n):
        state = step(state, jnp.float64(dt))
    c = np.asarray(model.grid.interior(state["solution"]["c"]))[:, 0, 0]
    x = np.asarray(model.grid.coord(0, "c"))
    # gaussian advected by 0.1 with periodic wrap
    expected = np.exp(-((np.mod(x - 0.5 - n * dt, 1.0) + 0.0 - 0.0) ** 2) / 0.01)
    expected = np.exp(-((np.minimum(np.abs(x - 0.6), 1 - np.abs(x - 0.6))) ** 2) / 0.01)
    assert np.argmax(c) == np.argmin(np.abs(x - 0.6))


def test_ensemble_vmap_mode():
    g = RectilinearGrid(size=(1, 1, 16), x=(0, 1), y=(0, 1), z=(-10, 0),
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    from clima_oceananigans_jl_tpu import ScalarDiffusivity
    from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
    from clima_oceananigans_jl_tpu.models.free_surface import ImplicitFreeSurface
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    model = HydrostaticFreeSurfaceModel(
        grid=g, free_surface=ImplicitFreeSurface(solver_method="pcg"),
        momentum_advection=None, tracer_advection=None,
        buoyancy=BuoyancyTracer(),
        closure=ScalarDiffusivity(kappa_z=0.01, nu_z=0.01,
                                  time_discretization="vertically_implicit"))
    members = [dict(b=lambda x, y, z, s=s: s * (z + 10) / 10)
               for s in (1e-5, 2e-5, 3e-5)]
    batched = ensemble_initial_state(model, members)
    step = ensemble_step(model)
    for _ in range(3):
        batched = step(batched, jnp.float64(10.0))
    for i, s in enumerate((1e-5, 2e-5, 3e-5)):
        b = np.asarray(member(batched, i)["solution"]["b"])
        assert np.all(np.isfinite(b))
        assert abs(b.max() - s) < s  # scale preserved per member


def test_bounds_preserving_weno_limits_overshoot():
    def run(scheme):
        g = RectilinearGrid(size=(64, 1, 1), x=(0, 1), y=(0, 1),
                            topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
        vel = PrescribedVelocityFields(u=lambda x, y, z, t: 1.0 + 0 * x)
        model = PrescribedVelocityModel(g, vel, tracers=("c",),
                                        tracer_advection=scheme)
        state = model.initial_state(
            c=lambda x, y, z: jnp.where((x > 0.25) & (x < 0.5), 1.0, 0.0))
        step = jax.jit(model.step)
        for _ in range(200):
            state = step(state, jnp.float64(2e-3))
        return np.asarray(model.grid.interior(state["solution"]["c"]))

    c_lim = run(BoundsPreservingWENO5())
    # reconstruction clipping keeps the square wave essentially in [0, 1]
    # (AB2 flux-form stepping allows a tiny residual; exact bounds need SSP)
    assert c_lim.min() >= -1e-3 and c_lim.max() <= 1.0 + 1e-3
    assert c_lim.max() > 0.5
    # and the reconstructed FACE values are strictly within neighbor bounds
    scheme = BoundsPreservingWENO5()
    c = jnp.asarray(np.r_[np.zeros(8), np.ones(8), np.zeros(8)])[None, None, :]
    rec = np.asarray(scheme.left_to_f(c, 2))[0, 0, 4:-4]
    lo = np.minimum(np.asarray(c)[0, 0, 3:-5], np.asarray(c)[0, 0, 4:-4])
    hi = np.maximum(np.asarray(c)[0, 0, 3:-5], np.asarray(c)[0, 0, 4:-4])
    assert np.all(rec >= lo - 1e-14) and np.all(rec <= hi + 1e-14)


def test_interpolate_and_regrid_and_function_field():
    from clima_oceananigans_jl_tpu.fields.field import (
        CenterField, FunctionField, interpolate, regrid, set_field,
    )
    from clima_oceananigans_jl_tpu import BOUNDED
    g1 = RectilinearGrid(size=(16, 16, 8), extent=(1, 1, 1),
                         topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float64)
    g2 = RectilinearGrid(size=(32, 32, 16), extent=(1, 1, 1),
                         topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float64)
    f = set_field(CenterField(g1), g1, lambda x, y, z: x + 2 * y - z)
    # pointwise trilinear interpolation is exact for a linear field
    assert abs(float(interpolate(f, g1, 0.3, 0.4, 0.5)) - (0.3 + 0.8 - 0.5)) < 1e-12
    # regrid onto the finer grid
    f2 = regrid(f, g1, g2)
    got = np.asarray(g2.interior(f2.data))
    xc = np.asarray(g2.coord(0, "c")); yc = np.asarray(g2.coord(1, "c"))
    zc = np.asarray(g2.coord(2, "c"))
    expect = xc[:, None, None] + 2 * yc[None, :, None] - zc[None, None, :]
    # away from the periodic wrap edges (the test function is not periodic,
    # so edge cells legitimately blend wrapped halo values) it is exact
    assert np.allclose(got[2:-2, 2:-2, 2:-2], expect[2:-2, 2:-2, 2:-2],
                       atol=1e-10)
    ff = FunctionField(lambda x, y, z: jnp.sin(x), time_dependent=False)
    assert np.allclose(np.asarray(g1.interior(ff.at_time(g1).data))[:, 0, 0],
                       np.sin(np.asarray(g1.coord(0, "c"))))


def test_weno_bf16_fast_mode_close_to_f32():
    from clima_oceananigans_jl_tpu.advection.fluxes import div_Uc
    from clima_oceananigans_jl_tpu import BOUNDED
    g = RectilinearGrid(size=(16, 16, 8), extent=(1, 1, 1),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    u, v, w, c = (jax.random.normal(k, g.total_shape, jnp.float64) for k in ks)
    ref = np.asarray(g.interior(div_Uc(g, WENO5(), u, v, w, c)))
    fast = np.asarray(g.interior(div_Uc(g, WENO5(fast_bf16=True), u, v, w, c)))
    scale = np.abs(ref).max()
    assert np.abs(fast - ref).max() < 0.05 * scale  # bf16 reconstruction ≈ f32


def test_teos10_published_check_value():
    """Roquet et al. (2015) polyTEOS10-bsq check value:
    rho(SA=30 g/kg, CT=10 C, Z=-1000 m) = 1027.45140 kg/m3."""
    from clima_oceananigans_jl_tpu.buoyancy.nonlinear_eos import (
        TEOS10EquationOfState)
    eos = TEOS10EquationOfState()
    rho = float(eos.density(jnp.float64(10.0), jnp.float64(30.0),
                            jnp.float64(-1000.0)))
    assert abs(rho - 1027.45140) < 1e-4
    # physically sensible expansion/contraction coefficients at (15 C, 35)
    alpha = -float(jax.grad(lambda T: eos.density(T, 35.0, 0.0))(15.0)) / 1025.0
    beta = float(jax.grad(lambda S: eos.density(15.0, S, 0.0))(35.0)) / 1025.0
    assert 1.5e-4 < alpha < 3e-4
    assert 7e-4 < beta < 8e-4


def test_teos10_in_model_runs():
    from clima_oceananigans_jl_tpu.buoyancy.nonlinear_eos import (
        TEOS10EquationOfState)
    from clima_oceananigans_jl_tpu import BOUNDED
    g = RectilinearGrid(size=(8, 8, 8), extent=(100., 100., 100.),
                        topology=(PERIODIC, PERIODIC, BOUNDED))
    buoy = SeawaterBuoyancy(equation_of_state=TEOS10EquationOfState())
    model = NonhydrostaticModel(g, buoyancy=buoy)
    assert set(model.tracer_names) == {"T", "S"}
    state = model.initial_state(T=lambda x, y, z: 15.0 + 1e-3 * z,
                                S=lambda x, y, z: 35.0)
    state = jax.jit(model.step)(state, 1.0)
    assert np.isfinite(np.asarray(state["solution"]["w"])).all()


def test_tilted_gravity_buoyancy_terms():
    """Constant b with tilted gravity accelerates flow along the tilt:
    Gu = gx_up*b, Gv = gy_up*b (reference g_dot_b.jl +
    nonhydrostatic_tendency_kernel_functions.jl:70,127)."""
    import math
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    from clima_oceananigans_jl_tpu import BOUNDED
    theta = math.radians(30.0)
    # stored vector points *down* (our convention): up-vector is its negation
    ghat = (-math.sin(theta), 0.0, -math.cos(theta))
    g = RectilinearGrid(size=(8, 4, 8), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, BOUNDED))
    model = NonhydrostaticModel(g, buoyancy=BuoyancyTracer(gravity_unit_vector=ghat))
    b0 = 0.37
    state = model.initial_state(b=b0)
    G = model.tendencies(state)
    gg = model.grid
    np.testing.assert_allclose(np.asarray(gg.interior(G["u"])),
                               math.sin(theta) * b0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gg.interior(G["v"])), 0.0, atol=1e-12)


def test_forcing_tuples_and_advective_binding():
    """Reference forcing regularization: a tuple of forcings per field
    sums (two_reacting_tracers.jl), and an AdvectiveForcing binds to the
    field it is attached to (model_forcing.jl)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from clima_oceananigans_jl_tpu import (BOUNDED, FLAT, RectilinearGrid,
                                           WENO5)
    from clima_oceananigans_jl_tpu.forcings.forcing import (AdvectiveForcing,
                                                            Forcing,
                                                            MultipleForcings)
    from clima_oceananigans_jl_tpu.models.prescribed import (
        PrescribedVelocityFields, PrescribedVelocityModel)

    grid = RectilinearGrid(size=(1, 1, 32), x=(0, 1), y=(0, 1), z=(-1, 1),
                           topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    m = PrescribedVelocityModel(
        grid, PrescribedVelocityFields(), tracers=("a", "b"),
        tracer_advection=WENO5(),
        forcing={
            "a": (Forcing(lambda x, y, z, t, a, b: -a * b,
                          field_dependencies=("a", "b")),
                  AdvectiveForcing(WENO5(), w=-0.5)),
            "b": Forcing(lambda x, y, z, t, a, b: +a * b,
                         field_dependencies=("a", "b")),
        })
    assert isinstance(m.forcing["a"], MultipleForcings)
    assert m.forcing["a"].parts[1].field_name == "a"  # bound to its key
    s = m.initial_state(a=lambda x, y, z: jnp.exp(-16 * z ** 2),
                        b=lambda x, y, z: jnp.exp(-16 * (z - 0.5) ** 2))
    tot0 = float(np.asarray(grid.interior(s["solution"]["a"])).sum()
                 + np.asarray(grid.interior(s["solution"]["b"])).sum())
    step = jax.jit(m.step)
    for _ in range(20):
        s = step(s, 1e-3)
    a = np.asarray(grid.interior(s["solution"]["a"]))
    b = np.asarray(grid.interior(s["solution"]["b"]))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # the antisymmetric reaction conserves a+b; the slip advection is
    # flux-form so the only leak is the Gaussian tails' wall flux
    # (~e^-16 of the mass)
    tot1 = float(a.sum() + b.sum())
    assert abs(tot1 - tot0) <= 1e-6 * abs(tot0)
