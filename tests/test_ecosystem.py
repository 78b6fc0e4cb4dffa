"""Ecosystem tests: forcings, Stokes drift, lazy operations, particles,
immersed boundaries, diagnostics (model: reference test_forcings.jl,
test_abstract_operations.jl, test_lagrangian_particle_tracking.jl,
test_immersed_boundary_grid.jl, test_diagnostics.jl)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, ScalarDiffusivity, CENTER,
    U_LOC, V_LOC, F, C, Simulation, IterationInterval,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.forcings.forcing import (
    AdvectiveForcing, Forcing, GaussianMask, LinearTarget, Relaxation,
)
from clima_oceananigans_jl_tpu.stokes_drift import UniformStokesDrift
from clima_oceananigans_jl_tpu.abstract_operations import (
    Average, Integral, KernelFunctionOperation, at, compute, partial_x,
    partial_y, partial_z,
)
from clima_oceananigans_jl_tpu.particles.lagrangian import (
    LagrangianParticles, interpolate_field,
)
from clima_oceananigans_jl_tpu.immersed.immersed import GridFittedBoundary, GridFittedBottom
from clima_oceananigans_jl_tpu.diagnostics.diagnostics import (
    AdvectiveCFL, DiffusiveCFL, StateChecker,
)
from clima_oceananigans_jl_tpu.fields.field import CenterField, set_field


def small_grid():
    return RectilinearGrid(size=(16, 16, 8), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                           z=(0, 1), topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)


# -- forcings ----------------------------------------------------------------
def test_continuous_forcing_with_parameters_and_dependencies():
    g = small_grid()
    model = NonhydrostaticModel(
        g, tracers=("c",),
        forcing={"c": Forcing(lambda x, y, z, t, c, p: -p["rate"] * c,
                              parameters={"rate": 2.0},
                              field_dependencies=("c",))})
    state = model.initial_state(c=1.0)
    step = jax.jit(model.step)
    s = step(state, jnp.float64(1e-2))
    c = np.asarray(model.grid.interior(s["solution"]["c"]))
    assert np.allclose(c, 1.0 - 2.0 * 1e-2, atol=1e-6)  # Euler first step


def test_relaxation_sponge():
    g = small_grid()
    relax = Relaxation(rate=1.0, mask=GaussianMask(center=1.0, width=0.1),
                       target=LinearTarget(intercept=0.0, gradient=1.0)).for_field("c")
    model = NonhydrostaticModel(g, tracers=("c",), forcing={"c": relax})
    state = model.initial_state(c=0.0)
    step = jax.jit(model.step)
    s = step(state, jnp.float64(1e-2))
    c = np.asarray(model.grid.interior(s["solution"]["c"]))
    assert c.max() > 0  # pulled toward the z-gradient target near z=1
    assert c[:, :, 0].max() < c[:, :, -1].max()


def test_advective_forcing_sinks_tracer():
    g = small_grid()
    model = NonhydrostaticModel(
        g, tracers=("c",),
        forcing={"c": AdvectiveForcing(w=-0.1).for_field("c")})
    state = model.initial_state(
        c=lambda x, y, z: jnp.exp(-((z - 0.7) ** 2) / 0.01))
    step = jax.jit(model.step)
    z = np.asarray(g.coord(2, "c"))
    com0 = float((np.asarray(model.grid.interior(state["solution"]["c"])).mean((0, 1)) * z).sum())
    for _ in range(20):
        state = step(state, jnp.float64(1e-2))
    cmean = np.asarray(model.grid.interior(state["solution"]["c"])).mean((0, 1))
    com = float((cmean * z).sum())
    assert com < com0  # center of mass moved down


# -- stokes drift -------------------------------------------------------------
def test_stokes_drift_terms_shape_and_model_runs():
    g = small_grid()
    sd = UniformStokesDrift(dz_us=lambda z, t: 0.1 * jnp.exp(4 * (z - 1.0)))
    model = NonhydrostaticModel(g, stokes_drift=sd)
    state = model.initial_state(
        u=lambda x, y, z: 0.01 * jnp.sin(x), w=0.0)
    step = jax.jit(model.step)
    for _ in range(3):
        state = step(state, jnp.float64(1e-3))
    assert np.all(np.isfinite(np.asarray(state["solution"]["u"])))


# -- abstract operations -------------------------------------------------------
def test_derivative_and_vorticity():
    g = small_grid()
    u = set_field(CenterField(g), g, lambda x, y, z: jnp.sin(x))
    dudx = compute(partial_x(u.with_data(u.data)), g)
    # ∂x sin(x) at faces ≈ cos(x_f) (2nd order)
    xf = np.asarray(g.coord(0, "f"))
    got = np.asarray(g.interior(dudx.data))[:, 0, 0]
    dx = 2 * np.pi / 16
    expected = np.cos(xf) * np.sin(dx / 2) / (dx / 2)
    assert np.allclose(got, expected, atol=1e-6)
    assert dudx.loc[0] is F


def test_binary_op_auto_interpolation_and_reductions():
    g = small_grid()
    a = set_field(CenterField(g), g, lambda x, y, z: z)
    b = set_field(CenterField(g), g, 2.0)
    s = compute(a + b, g)
    assert np.allclose(np.asarray(g.interior(s.data))[0, 0],
                       np.asarray(g.coord(2, "c")) + 2.0)
    avg = Average(a, dims=(0, 1, 2)).compute(g)
    assert abs(float(avg) - 0.5) < 1e-12       # mean of z over (0,1)
    tot = Integral(b, dims=(0, 1, 2)).compute(g)
    assert abs(float(tot) - 2.0 * (2 * np.pi) ** 2) < 1e-8


def test_kernel_function_operation():
    g = small_grid()
    op = KernelFunctionOperation(lambda grid: grid.nodes(CENTER, True)[0] * 0 + 3.0)
    f = compute(op, g)
    assert np.allclose(np.asarray(g.interior(f.data)), 3.0)


# -- particles ---------------------------------------------------------------
def test_particle_advection_uniform_flow_and_wrap():
    g = small_grid()
    u = jnp.ones(g.total_shape)
    v = jnp.zeros(g.total_shape)
    w = jnp.zeros(g.total_shape)
    p = LagrangianParticles(x=jnp.array([0.1, 6.0]), y=jnp.array([1.0, 1.0]),
                            z=jnp.array([0.5, 0.5]))
    for _ in range(10):
        p = p.step(g, dict(u=u, v=v, w=w), 0.1)
    assert np.allclose(np.asarray(p.x), np.mod(np.array([0.1, 6.0]) + 1.0, 2 * np.pi),
                       atol=1e-6)


def test_particle_wall_bounce_and_tracking():
    g = small_grid()
    u = jnp.zeros(g.total_shape)
    w = jnp.full(g.total_shape, 0.5)
    cf = set_field(CenterField(g), g, lambda x, y, z: z)
    p = LagrangianParticles(x=jnp.array([1.0]), y=jnp.array([1.0]),
                            z=jnp.array([0.9]), tracked_fields=("c",))
    p = p.step(g, dict(u=u, v=u, w=w), 0.5, fields=dict(c=cf.data))
    assert float(p.z[0]) <= 1.0  # reflected off the top wall
    assert abs(float(p.properties["c"][0]) - float(p.z[0])) < 0.1


def test_trilinear_interpolation_exact_for_linear_field():
    g = small_grid()
    c = set_field(CenterField(g), g, lambda x, y, z: 2 * x + 3 * y - z)
    xs = jnp.array([1.0, 2.5]); ys = jnp.array([0.7, 3.3]); zs = jnp.array([0.4, 0.6])
    got = interpolate_field(c.data, g, CENTER, xs, ys, zs)
    assert np.allclose(np.asarray(got), np.asarray(2 * xs + 3 * ys - zs), atol=1e-10)


# -- immersed boundaries -------------------------------------------------------
def test_immersed_boundary_masks_velocity_and_runs():
    g = small_grid()
    ib = GridFittedBottom(lambda x, y: 0.25 + 0 * x)
    model = NonhydrostaticModel(g, immersed_boundary=ib, tracers=("c",))
    state = model.initial_state(u=lambda x, y, z: 0.1 * jnp.cos(x), c=1.0)
    step = jax.jit(model.step)
    for _ in range(5):
        state = step(state, jnp.float64(1e-3))
    u = np.asarray(state["solution"]["u"])
    z = np.asarray(model.grid.coord(2, "c", with_halo=True))
    solid = z < 0.25
    assert np.abs(u[:, :, solid]).max() == 0.0
    assert np.all(np.isfinite(u))


def test_immersed_mask_shapes():
    g = small_grid()
    ib = GridFittedBoundary(lambda x, y, z: (x - np.pi) ** 2 + (y - np.pi) ** 2 < 1.0).build(g)
    assert ib.solid_ccc.shape == g.total_shape
    # face mask is a superset of the center mask
    assert bool(jnp.all(ib.solid_fcc | ~ib.solid_ccc))


# -- diagnostics ---------------------------------------------------------------
def test_cfl_diagnostics_and_state_checker(caplog):
    g = small_grid()
    model = NonhydrostaticModel(g, closure=ScalarDiffusivity(nu=1e-3))
    state = model.initial_state(u=lambda x, y, z: 1.0 + 0 * x)
    sim = Simulation(model, state=state, dt=0.01, stop_iteration=1)
    cfl = AdvectiveCFL()(sim)
    dx = 2 * np.pi / 16
    assert abs(cfl - 0.01 / dx * 1.0) / cfl < 0.2
    dcfl = DiffusiveCFL()(sim)
    assert dcfl > 0
    import logging
    with caplog.at_level(logging.INFO, logger="clima_oceananigans_jl_tpu"):
        StateChecker()(sim)
    assert any("state" in r.message for r in caplog.records)


def test_particles_advect_inside_model_step():
    """Particles ride the jitted model step (reference calls
    update_particle_properties! inside time_step!)."""
    from clima_oceananigans_jl_tpu.particles.lagrangian import LagrangianParticles
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
    g = RectilinearGrid(size=(16, 16, 8), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, BOUNDED))
    p0 = LagrangianParticles(x=jnp.asarray([0.3, 0.5]),
                             y=jnp.asarray([0.4, 0.6]),
                             z=jnp.asarray([-0.5, -0.25]) + 0.5,
                             tracked_fields=("b",))
    model = NonhydrostaticModel(
        g, tracers=("b",), particles=p0)
    state = model.initial_state(u=0.1, b=lambda x, y, z: x)
    x_before = np.asarray(state["particles"].x)
    dt = 0.01
    step = jax.jit(model.step)
    for _ in range(5):
        state = step(state, dt)
    p = state["particles"]
    # advected ~ 5*dt*u in x (uniform u=0.1 is divergence-free: projection
    # preserves it)
    np.testing.assert_allclose(np.asarray(p.x), x_before + 0.005, atol=1e-3)
    assert "b" in p.properties and np.isfinite(np.asarray(p.properties["b"])).all()
    # tracked field b = x sampled at the particle
    np.testing.assert_allclose(np.asarray(p.properties["b"]),
                               np.asarray(p.x), atol=0.05)


def test_particles_in_shallow_water_step():
    from clima_oceananigans_jl_tpu.particles.lagrangian import LagrangianParticles
    from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
    from clima_oceananigans_jl_tpu import FLAT
    g = RectilinearGrid(size=(16, 16, 1), extent=(1., 1., 1.),
                        topology=(PERIODIC, PERIODIC, FLAT))
    p0 = LagrangianParticles(x=jnp.asarray([0.5]), y=jnp.asarray([0.5]),
                             z=jnp.asarray([0.0]))
    model = ShallowWaterModel(g, particles=p0)
    state = model.initial_state(uh=0.2, h=1.0)
    state = jax.jit(model.step)(state, 0.01)
    assert float(state["particles"].x[0]) > 0.5


def test_multiary_operation():
    """Multiary ops interpolate every argument to a common location
    (reference AbstractOperations/multiary_operations.jl)."""
    from clima_oceananigans_jl_tpu.abstract_operations import (
        MultiaryOperation, compute)
    from clima_oceananigans_jl_tpu.fields.field import (CenterField,
                                                        XFaceField, set_field)
    grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    a = set_field(CenterField(grid), grid, lambda x, y, z: x + 0 * y)
    b = set_field(XFaceField(grid), grid, lambda x, y, z: 2 * x + 0 * y)
    c = set_field(CenterField(grid), grid, 1.0)
    s = compute(MultiaryOperation(lambda *vs: sum(vs), (a, b, c)), grid)
    assert s.loc == a.loc
    # interior away from the periodic seam: x + 2x + 1 (b interpolated C←F)
    xs = np.asarray(grid.coord(0, a.loc[0]))
    got = np.asarray(grid.interior(s.data))[2:-2, 0, 0]
    assert np.allclose(got, 3 * xs[2:-2] + 1, atol=1e-12)


def test_windowed_field_view_and_writer_indices(tmp_path):
    """Windowed `indices` views (reference src/Fields/field.jl windowed
    fields) + writer-level slicing."""
    from clima_oceananigans_jl_tpu.fields.field import (CenterField,
                                                        set_field, windowed)
    grid = RectilinearGrid(size=(8, 6, 4), extent=(1, 1, 1),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    f = set_field(CenterField(grid), grid, lambda x, y, z: x + 10 * y + 100 * z)
    w = windowed(f, grid, ((2, 5), None, 3))
    assert w.data.shape == (3, 6, 1)
    full = np.asarray(grid.interior(f.data))
    assert np.allclose(np.asarray(w.data), full[2:5, :, 3:4])

    # writer indices: surface slice only
    from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
    from clima_oceananigans_jl_tpu.output.writers import HDF5OutputWriter
    from clima_oceananigans_jl_tpu.simulation.simulation import Simulation
    g2 = RectilinearGrid(size=(8, 8, 1), extent=(1, 1, 1),
                         topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g2, gravitational_acceleration=1.0)
    state = model.initial_state(h=1.0)
    sim = Simulation(model, state, dt=1e-3, stop_iteration=2)
    path = str(tmp_path / "win.h5")
    sim.output_writers["w"] = HDF5OutputWriter(
        {"h": None}, path, indices=((0, 4), (2, 6), None))
    sim.run()
    import h5py
    with h5py.File(path, "r") as fh:
        arr = fh["timeseries/h/0"][()]
    assert arr.shape[:2] == (4, 4)


def test_set_field_from_field_and_operation():
    """Broadcasting-onto-fields: set! from another Field (location
    interpolated) and from a lazy operation
    (src/Fields/broadcasting_abstract_operations.jl)."""
    from clima_oceananigans_jl_tpu.fields.field import (CenterField,
                                                        XFaceField, set_field)
    grid = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    u = set_field(XFaceField(grid), grid, lambda x, y, z: jnp.sin(2 * np.pi * x))
    c = set_field(CenterField(grid), grid, 2.0 * u)      # lazy op → center
    cf = set_field(CenterField(grid), grid, u)           # field → interp
    ui = np.asarray(grid.interior(u.data))
    # C←F interpolation: mean of adjacent faces
    u_at_c = 0.5 * (ui + np.roll(ui, -1, 0))
    assert np.allclose(np.asarray(grid.interior(cf.data)), u_at_c, atol=1e-12)
    assert np.allclose(np.asarray(grid.interior(c.data)), 2 * u_at_c, atol=1e-12)


def test_grid_metric_operand():
    """Grid metrics as expression operands (reference grid_metrics.jl):
    summing c·V over the interior equals the metric-weighted Integral."""
    from clima_oceananigans_jl_tpu.abstract_operations import (
        GridMetric, Integral, compute)
    from clima_oceananigans_jl_tpu.fields.field import CenterField, set_field
    import numpy as _np

    zf = -_np.cos(_np.linspace(0, _np.pi / 2, 5))  # stretched z
    grid = RectilinearGrid(size=(8, 4, 4), x=(0, 2.0), y=(0, 1.0), z=zf,
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           dtype=jnp.float64)
    c = set_field(CenterField(grid), grid, lambda x, y, z: 1.0 + x * z)
    cv = compute(c * GridMetric("volume"), grid)
    direct = float(jnp.sum(grid.interior(cv.data)))
    via_integral = float(Integral(c).compute(grid))
    assert np.isclose(direct, via_integral, rtol=1e-12)


def test_relaxation_binds_dict_key_like_reference():
    """forcing={'c': Relaxation(...)} without an explicit field_name must
    bind to its dict key (reference model_forcing.jl regularization) —
    previously only AdvectiveForcing was bound and Relaxation crashed
    with fields[None]."""
    g = small_grid()
    relax = Relaxation(rate=1.0, mask=GaussianMask(center=1.0, width=0.1),
                       target=LinearTarget(intercept=0.0, gradient=1.0))
    model = NonhydrostaticModel(g, tracers=("c",), forcing={"c": relax})
    assert model.forcing["c"].field_name == "c"
    state = model.initial_state(c=0.0)
    s = jax.jit(model.step)(state, jnp.float64(1e-2))
    assert np.asarray(model.grid.interior(s["solution"]["c"])).max() > 0
