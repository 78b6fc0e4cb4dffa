"""Named convenience APIs: BackgroundField, BuoyancyField, PressureField,
AveragedTimeInterval (reference export list Oceananigans.jl:40-44,100-104)."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import (
    BOUNDED, PERIODIC, FLAT, AveragedTimeInterval, BackgroundField,
    BuoyancyField, CenteredFourthOrder, FPlane, HDF5OutputWriter,
    PressureField, RectilinearGrid, ScalarDiffusivity, Simulation,
)
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel


def _model(bg=None):
    grid = RectilinearGrid(size=(8, 1, 8), x=(-np.pi, np.pi), y=(0, 1),
                           z=(-np.pi, np.pi),
                           topology=(PERIODIC, FLAT, PERIODIC),
                           dtype=jnp.float64)
    return NonhydrostaticModel(grid, advection=CenteredFourthOrder(),
                               buoyancy=BuoyancyTracer(), coriolis=FPlane(f=0.2),
                               closure=ScalarDiffusivity(nu=1e-6, kappa=1e-6),
                               timestepper="RungeKutta3",
                               background_fields=bg)


def test_background_field_matches_manual_array():
    """BackgroundField(func, parameters) must reproduce the documented
    manual path (a raw with-halo array in background_fields)."""
    N = 1.0
    bgf = BackgroundField(lambda x, y, z, t, N: N**2 * z, parameters=N)
    m1 = _model(bg={"b": bgf})
    zc = m1.grid.nodes(("c", "c", "c"), with_halo=True)[2]
    manual = jnp.broadcast_to(N**2 * zc, m1.grid.total_shape).astype(m1.grid.dtype)
    m2 = _model(bg={"b": manual})
    key = jax.random.PRNGKey(0)
    u0 = 1e-3 * jax.random.normal(key, m1.grid.shape, m1.grid.dtype)
    s1 = m1.initial_state(u=u0)
    s2 = m2.initial_state(u=u0)
    step1 = jax.jit(m1.step)
    step2 = jax.jit(m2.step)
    for _ in range(2):
        s1 = step1(s1, jnp.float64(1e-3))
        s2 = step2(s2, jnp.float64(1e-3))
    for k in s1["solution"]:
        assert np.array_equal(np.asarray(s1["solution"][k]),
                              np.asarray(s2["solution"][k])), k


def test_time_dependent_background_field():
    """A t-dependent BackgroundField changes the tendencies between
    times (evaluated at the traced clock time inside one jitted step)."""
    bgf = BackgroundField(lambda x, y, z, t: jnp.sin(t) * z)
    m = _model(bg={"b": bgf})
    assert np.allclose(
        np.asarray(bgf.evaluate(m.grid, ("c", "c", "c"), 0.0)), 0.0)
    ev1 = np.asarray(bgf.evaluate(m.grid, ("c", "c", "c"), np.pi / 2))
    zc = np.asarray(m.grid.nodes(("c", "c", "c"), with_halo=True)[2])
    assert np.allclose(ev1, np.broadcast_to(zc, ev1.shape))
    # and a full step with the time-dependent field runs finite
    s = m.initial_state(u=1e-3)
    s = jax.jit(m.step)(s, jnp.float64(1e-3))
    assert bool(jnp.all(jnp.isfinite(s["solution"]["b"])))


def test_buoyancy_and_pressure_fields():
    m = _model()
    s = m.initial_state(b=lambda x, y, z: z)
    s = jax.jit(m.step)(s, jnp.float64(1e-3))
    b = BuoyancyField(m, s)
    assert b.data.shape == m.grid.total_shape
    assert np.array_equal(np.asarray(b.data), np.asarray(s["solution"]["b"]))
    p = PressureField(m, s)
    assert p.data.shape == m.grid.total_shape
    assert bool(jnp.all(jnp.isfinite(p.data)))


def test_averaged_time_interval_writer(tmp_path):
    """An HDF5 writer scheduled with AveragedTimeInterval records window
    time-averages: for output = model time t with interval 4, window 2,
    the mean over [2, 4] is 3 (trapezoid-exact for linear-in-t data)."""
    import h5py
    m = _model()
    s = m.initial_state()
    sim = Simulation(m, state=s, dt=0.25, stop_time=8.0)
    path = str(tmp_path / "avg.h5")
    sim.output_writers["avg"] = HDF5OutputWriter(
        {"tval": lambda sim: np.array([sim.model_time()])},
        path, schedule=AveragedTimeInterval(4.0, window=2.0))
    sim.run()
    with h5py.File(path, "r") as f:
        idx = sorted(f["timeseries/tval"], key=int)
        vals = [float(f[f"timeseries/tval/{i}"][0]) for i in idx]
    # first firing is the initial actuation (instantaneous 0), then the
    # window means: mean over [2,4] = 3, mean over [6,8] = 7
    assert abs(vals[-2] - 3.0) < 0.15, vals
    assert abs(vals[-1] - 7.0) < 0.15, vals
