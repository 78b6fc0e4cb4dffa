"""Simulation-loop semantics: schedules, Δt alignment, adaptive stepping,
NaN checking (model: /root/reference/test/test_simulations.jl +
test_schedules.jl + test_time_step_wizard.jl)."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import (
    FLAT, PERIODIC, RectilinearGrid, Simulation, Callback, WENO5,
    TimeInterval, IterationInterval, SpecifiedTimes, AndSchedule, OrSchedule,
    TimeStepWizard, NaNChecker,
)
from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel


def _sim(stop_iteration=50, stop_time=np.inf, dt=0.01):
    grid = RectilinearGrid(size=(16, 16, 1), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                           topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=10.0,
                              advection=WENO5())
    state = model.initial_state(uh=lambda x, y, z: 0.01 * jnp.sin(x), h=1.0)
    return Simulation(model, state=state, dt=dt,
                      stop_iteration=stop_iteration, stop_time=stop_time)


def test_time_interval_aligns_dt():
    """Δt shrinks so actuations land exactly on the schedule lattice
    (reference aligned_time_step, run.jl:42-57)."""
    sim = _sim(stop_iteration=1000, stop_time=0.25, dt=0.04)
    fired_at = []
    sim.callbacks["c"] = Callback(lambda s: fired_at.append(s.model_time()),
                                  TimeInterval(0.1))
    sim.run()
    lattice = [t for t in fired_at if t > 0]
    assert lattice, "schedule never fired"
    for t in lattice:
        assert abs(t / 0.1 - round(t / 0.1)) < 1e-8, fired_at
    assert abs(sim.model_time() - 0.25) < 1e-9  # stopped exactly at stop_time


def test_specified_times_and_combinators():
    sim = _sim(stop_iteration=10_000, stop_time=0.2, dt=0.03)
    hits = []
    sim.callbacks["s"] = Callback(lambda s: hits.append(s.model_time()),
                                  SpecifiedTimes(0.05, 0.17))
    sim.run()
    hits = [t for t in hits if t > 0]
    assert len(hits) == 2
    assert abs(hits[0] - 0.05) < 1e-9 and abs(hits[1] - 0.17) < 1e-9

    # combinators (host logic only)
    class FakeSim:
        def model_time(self):
            return 1.0

        def model_iteration(self):
            return 4

    both = AndSchedule(IterationInterval(2), IterationInterval(4))
    either = OrSchedule(IterationInterval(3), IterationInterval(4))
    assert both(FakeSim()) and either(FakeSim())


def test_time_step_wizard_adapts_dt():
    sim = _sim(stop_iteration=6, dt=1e-4)
    sim.callbacks["wizard"] = Callback(TimeStepWizard(cfl=0.5, max_change=1.5),
                                       IterationInterval(1))
    dt0 = sim.dt
    sim.run()
    assert sim.dt > dt0          # CFL allows a much larger step
    assert sim.dt <= dt0 * 1.5 ** 7  # growth clamped by max_change


def test_time_step_wizard_diffusive_cfl_limits_dt():
    """With a large ν, the diffusion timescale (Δ²/ν) — not the advective
    one — must clamp Δt (reference time_step_wizard.jl:44-52 takes
    min(advective, diffusive) before the change clamps)."""
    from clima_oceananigans_jl_tpu.closures.scalar_diffusivity import (
        ScalarDiffusivity, cell_diffusion_timescale)
    grid = RectilinearGrid(size=(16, 16, 1), x=(0, 2 * np.pi), y=(0, 2 * np.pi),
                           topology=(PERIODIC, PERIODIC, FLAT),
                           dtype=jnp.float64)
    nu = 0.37
    closure = ScalarDiffusivity(nu=nu)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=10.0,
                              advection=WENO5(), closure=closure)
    state = model.initial_state(uh=lambda x, y, z: 0.01 * jnp.sin(x), h=1.0)
    sim = Simulation(model, state=state, dt=1e-6, stop_iteration=40)

    # hand-computed reference semantics: Δ²/ν with the min spacing
    d = 2 * np.pi / 16
    expected_scale = d ** 2 / nu
    got = cell_diffusion_timescale(closure, grid, None, ())
    assert np.isclose(got, expected_scale, rtol=1e-12)

    wiz = TimeStepWizard(cfl=10.0, diffusive_cfl=0.2, max_change=10.0)
    sim.callbacks["wizard"] = Callback(wiz, IterationInterval(1))
    sim.run()
    # advective CFL alone would allow a much larger Δt; the diffusive
    # limit must cap it at diffusive_cfl * Δ²/ν
    assert sim.dt <= 0.2 * expected_scale * (1 + 1e-12)
    assert sim.dt > 0.19 * expected_scale  # and it actually reached the cap

    # vertically-implicit closures do not limit through their vertical part
    impl = ScalarDiffusivity(nu_z=1e6, nu=0.0, kappa=0.0,
                             time_discretization="vertically_implicit")
    assert cell_diffusion_timescale(impl, grid, None, ()) == np.inf

    # closure tuples take the min; biharmonic limits by Δ⁴/ν
    from clima_oceananigans_jl_tpu.closures.scalar_diffusivity import (
        ScalarBiharmonicDiffusivity)
    bi = ScalarBiharmonicDiffusivity(nu=1e-4)
    t_tuple = cell_diffusion_timescale((closure, bi), grid, (None, None), ())
    assert np.isclose(t_tuple, min(expected_scale, d ** 4 / 1e-4), rtol=1e-12)


def test_nan_checker_stops_run():
    sim = _sim(stop_iteration=1000, dt=0.01)
    def poison(s):
        sol = dict(s.state["solution"])
        sol["h"] = sol["h"].at[8, 8, 0].set(jnp.nan)
        s.state = dict(s.state, solution=sol)
    sim.callbacks["poison"] = Callback(poison, IterationInterval(3))
    sim.callbacks["nan_checker"] = Callback(NaNChecker(("h",)), IterationInterval(1))
    sim.run()
    assert sim.model_iteration() < 10  # stopped early, no crash
    assert not sim.running
