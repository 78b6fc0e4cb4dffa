"""Shallow-water model tests (model: reference test_shallow_water_models.jl
+ the Bickley-jet regression setup)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, ShallowWaterModel, Simulation,
    FPlane, WENO5, CenteredSecondOrder, UpwindBiasedThirdOrder,
    IterationInterval, Callback,
)


def _grid(n=16, L=2 * np.pi):
    return RectilinearGrid(size=(n, n, 1), x=(0, L), y=(0, L),
                           topology=(PERIODIC, PERIODIC, FLAT),
                           dtype=jnp.float64)


def test_rest_state_is_steady():
    model = ShallowWaterModel(grid=_grid(), coriolis=FPlane(f=1.0))
    state = model.initial_state(h=1.0)
    s2 = jax.jit(model.step)(state, jnp.float64(0.01))
    for k in ("uh", "vh", "h"):
        assert np.allclose(np.asarray(s2["solution"][k]),
                           np.asarray(state["solution"][k]), atol=1e-14)
    assert np.isclose(float(s2["clock"].time), 0.01)
    assert int(s2["clock"].iteration) == 1


def test_mass_conservation():
    g = _grid()
    model = ShallowWaterModel(grid=g, advection=WENO5())
    state = model.initial_state(
        uh=lambda x, y, z: 0.1 * jnp.sin(x) * jnp.cos(y),
        vh=lambda x, y, z: -0.1 * jnp.cos(x) * jnp.sin(2 * y),
        h=lambda x, y, z: 1.0 + 0.1 * jnp.cos(x + y))
    vol0 = float(jnp.sum(g.interior(state["solution"]["h"])))
    step = jax.jit(model.step)
    for _ in range(20):
        state = step(state, jnp.float64(1e-3))
    vol1 = float(jnp.sum(g.interior(state["solution"]["h"])))
    assert np.isclose(vol0, vol1, rtol=1e-12)


def test_tracer_is_advected_and_conserved():
    g = _grid()
    model = ShallowWaterModel(grid=g, tracers=("c",),
                              tracer_advection=UpwindBiasedThirdOrder())
    state = model.initial_state(
        uh=1.0, vh=0.0, h=1.0,
        c=lambda x, y, z: jnp.exp(-((x - np.pi) ** 2) * 2))
    c0 = np.asarray(g.interior(state["solution"]["c"]))
    step = jax.jit(model.step)
    for _ in range(50):
        state = step(state, jnp.float64(2e-3))
    c1 = np.asarray(g.interior(state["solution"]["c"]))
    # advected: profile moved, peak near x = π + 0.1
    assert not np.allclose(c0, c1, atol=1e-4)
    assert c1.max() > 0.5 * c0.max()


@pytest.mark.parametrize("scheme", [CenteredSecondOrder(), UpwindBiasedThirdOrder(), WENO5()])
def test_gravity_wave_propagation(scheme):
    # small-amplitude wave: phase speed √(g h0); just check stability + motion
    g = _grid(n=32, L=1.0)
    model = ShallowWaterModel(grid=g, gravitational_acceleration=1.0, advection=scheme)
    state = model.initial_state(h=lambda x, y, z: 1.0 + 1e-3 * jnp.sin(2 * np.pi * x))
    step = jax.jit(model.step)
    for _ in range(100):
        state = step(state, jnp.float64(1e-3))
    h = np.asarray(g.interior(state["solution"]["h"]))
    assert np.all(np.isfinite(h))
    uh = np.asarray(g.interior(state["solution"]["uh"]))
    assert np.abs(uh).max() > 1e-6  # wave started moving


def test_bickley_jet_instability_grows():
    """Unstable Bickley jet (validation/bickley_jet): perturbation KE grows."""
    n, L = 32, 4 * np.pi
    g = RectilinearGrid(size=(n, n, 1), x=(-L / 2, L / 2), y=(-L / 2, L / 2),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, gravitational_acceleration=10.0,
                              advection=WENO5(), coriolis=FPlane(f=1.0))
    h0, dh = 10.0, 1.0
    ell, eps, k = 0.5, 0.1, 0.5

    def hj(x, y, z):
        return h0 - dh * jnp.tanh(y / ell)

    def uj(x, y, z):
        return (10.0 * dh / (ell * 1.0)) * (1.0 / jnp.cosh(y / ell)) ** 2 * 0  \
            + dh / jnp.cosh(y / ell) ** 2  # jet profile U sech²(y/ℓ)

    def uh0(x, y, z):
        u = uj(x, y, z)
        pert = eps * jnp.exp(-(y / ell) ** 2) * jnp.cos(k * x)
        return (u + pert) * hj(x, y, z)

    state = model.initial_state(uh=uh0, vh=0.0, h=hj)
    step = jax.jit(model.step)

    def perturbation_ke(s):
        v = s["solution"]["vh"]
        return float(jnp.sum(g.interior(v) ** 2))

    ke0 = perturbation_ke(state)
    for _ in range(200):
        state = step(state, jnp.float64(5e-3))
    ke1 = perturbation_ke(state)
    assert np.isfinite(ke1)
    assert ke1 > ke0  # shear instability extracts energy into v


def test_simulation_loop_runs_and_stops():
    model = ShallowWaterModel(grid=_grid())
    state = model.initial_state(h=1.0)
    sim = Simulation(model, state=state, dt=0.01, stop_iteration=5)
    fired = []
    sim.callbacks["probe"] = Callback(lambda s: fired.append(s.model_iteration()),
                                      IterationInterval(2))
    sim.run()
    assert sim.model_iteration() == 5
    assert np.isclose(sim.model_time(), 0.05)
    assert fired  # callback fired at least once


def test_simulation_stop_time_alignment():
    model = ShallowWaterModel(grid=_grid())
    sim = Simulation(model, state=model.initial_state(h=1.0),
                     dt=0.03, stop_time=0.1)
    sim.run()
    assert np.isclose(sim.model_time(), 0.1)


def test_vector_invariant_formulation():
    """VI formulation (prognostic u, v, h — reference
    shallow_water_model.jl:37-57): runs stably, conserves volume, and its
    velocity field tracks the conservative formulation on a smooth flow."""
    g = RectilinearGrid(size=(32, 32, 1), extent=(2 * np.pi, 2 * np.pi, 1),
                        topology=(PERIODIC, PERIODIC, FLAT), dtype=jnp.float64)
    u0 = lambda x, y, z: 0.05 * jnp.sin(x) * jnp.cos(y)
    h0 = lambda x, y, z: 1.0 + 0.01 * jnp.cos(x)
    vi = ShallowWaterModel(g, formulation="vector_invariant")
    assert vi.prognostic_names()[:3] == ("u", "v", "h")
    sv = vi.initial_state(u=u0, h=h0)
    cons = ShallowWaterModel(g)
    # matching initial transport uh = u * h̄ˣ
    from clima_oceananigans_jl_tpu.ops import stencil as st
    sc = cons.initial_state(h=h0)
    u_arr = sv["solution"]["u"]
    sc["solution"]["uh"] = u_arr * st.ixf(sc["solution"]["h"])
    dt = 1e-3
    vol0 = float(jnp.sum(vi.grid.interior(sv["solution"]["h"])))
    for _ in range(20):
        sv = jax.jit(vi.step)(sv, dt)
        sc = jax.jit(cons.step)(sc, dt)
    vol1 = float(jnp.sum(vi.grid.interior(sv["solution"]["h"])))
    assert abs(vol1 - vol0) < 1e-9 * abs(vol0)
    u_vi = np.asarray(vi.grid.interior(vi.velocities(sv)["u"]))
    u_co = np.asarray(cons.grid.interior(cons.velocities(sc)["u"]))
    assert np.isfinite(u_vi).all()
    # same PDE, different discretizations: close on a smooth short run
    assert np.abs(u_vi - u_co).max() < 5e-4
