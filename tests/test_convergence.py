"""Spatial order-of-accuracy tests
(model: /root/reference/validation/convergence_tests/: measured order of
the advection schemes on a smooth advected profile)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    FLAT, PERIODIC, RectilinearGrid, WENO5, CenteredSecondOrder,
    CenteredFourthOrder,
)
from clima_oceananigans_jl_tpu.advection.schemes import (
    UpwindBiasedThirdOrder, UpwindBiasedFifthOrder,
)
from clima_oceananigans_jl_tpu.advection.fluxes import div_Uc


def advection_error(scheme, n):
    """|numerical − analytic| of d/dx(u c) for u=1, c = sin(2πx)."""
    g = RectilinearGrid(size=(n, 1, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, FLAT, FLAT), halo=(4, 1, 1),
                        dtype=jnp.float64)
    x = g.nodes((list("c") and __import__("clima_oceananigans_jl_tpu").CENTER),
                with_halo=True)[0]
    c = jnp.sin(2 * jnp.pi * x) * jnp.ones(g.total_shape)
    u = jnp.ones(g.total_shape)
    w = jnp.zeros(g.total_shape)
    div = div_Uc(g, scheme, u, w, w, c)
    xc = np.asarray(g.coord(0, "c"))
    got = np.asarray(g.interior(div))[:, 0, 0]
    exact = 2 * np.pi * np.cos(2 * np.pi * xc)
    return np.abs(got - exact).max()


@pytest.mark.parametrize("scheme,order", [
    (CenteredSecondOrder(), 2),
    # the reference's CenteredFourthOrder uses the (9/16, -1/16) 4th-order
    # POINT interpolant (centered_fourth_order.jl); its flux difference
    # converges at 2nd order, matching the reference's behavior
    (CenteredFourthOrder(), 2),
    (UpwindBiasedThirdOrder(), 3),
    (UpwindBiasedFifthOrder(), 5),
    (WENO5(), 5),
])
def test_advection_scheme_order(scheme, order):
    n1, n2 = 32, 64
    e1 = advection_error(scheme, n1)
    e2 = advection_error(scheme, n2)
    measured = np.log2(e1 / e2)
    assert measured > order - 0.35, (measured, order)


def bounded_advection_error(scheme, n):
    """d/dx(u c) error on a BOUNDED axis with u=1 (flux difference with
    constant transport isolates the reconstruction order), c = cos(pi x)
    analytic everywhere incl. the halos: exercises the near-boundary
    order reduction (reference topologically_conditional_interpolation.jl)."""
    from clima_oceananigans_jl_tpu import BOUNDED, CENTER
    g = RectilinearGrid(size=(n, 1, 1), x=(0, 1), y=(0, 1),
                        topology=(BOUNDED, FLAT, FLAT), halo=(4, 1, 1),
                        dtype=jnp.float64)
    xc = g.nodes(CENTER, with_halo=True)[0]
    c = jnp.cos(jnp.pi * xc) * jnp.ones(g.total_shape)
    u = jnp.ones(g.total_shape)
    w = jnp.zeros(g.total_shape)
    div = np.asarray(g.interior(div_Uc(g, scheme, u, w, w, c)))[:, 0, 0]
    x = np.asarray(g.coord(0, "c"))
    exact = -np.pi * np.sin(np.pi * x)
    return np.abs(div - exact)


@pytest.mark.parametrize("scheme,order", [
    (UpwindBiasedThirdOrder(), 3),
    (WENO5(), 5),
])
def test_bounded_axis_order_reduction(scheme, order):
    """Interior keeps the design order; the reduced near-wall band stays
    2nd-order accurate (no ghost-extrapolation garbage)."""
    e1 = bounded_advection_error(scheme, 32)
    e2 = bounded_advection_error(scheme, 64)
    buf = scheme.required_halo + 1
    interior = np.log2(e1[buf:-buf].max() / e2[2 * buf:-2 * buf].max())
    assert interior > order - 0.5, interior
    # the reduced band converges too (the high/low-order transition face
    # carries a locally 1st-order flux mismatch — same as the reference's
    # conditional interpolation), and stays small in absolute terms
    wall = np.log2(e1[:buf].max() / e2[:buf].max())
    assert wall > 0.8, wall
    assert np.isfinite(e1).all() and e1.max() < 0.1


# -- temporal order: point exponential decay (reference
# validation/convergence_tests/point_exponential_decay.jl) ------------------
def _decay_error(timestepper, dt, chi=None):
    """Forced dc/dt = −c on a tiny grid; error vs c0·e^{−t} at t=1."""
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)
    g = RectilinearGrid(size=(4, 1, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
    model = NonhydrostaticModel(g, tracers=("c",), advection=None,
                                timestepper=timestepper,
                                forcing={"c": lambda grid, clock, fields: -fields["c"]})
    if chi is not None:
        model.ab2_chi = chi
    g = model.grid
    state = model.initial_state(c=1.0)
    n = round(1.0 / dt)
    step = jax.jit(model.step)
    for _ in range(n):
        state = step(state, jnp.float64(dt))
    got = float(np.asarray(g.interior(state["solution"]["c"])).mean())
    return abs(got - np.exp(-1.0))


@pytest.mark.parametrize("timestepper,chi,order", [
    # χ>0 introduces a χ·dt² local error → formally 1st order (the
    # reference's quasi-AB2 has the same property; χ trades order for
    # stability, quasi_adams_bashforth_2.jl)
    ("QuasiAdamsBashforth2", 0.1, 0.95),
    ("QuasiAdamsBashforth2", 0.0, 1.9),  # pure AB2: 2nd order
    ("RungeKutta3", None, 2.9),          # linear problem: full 3rd order
])
def test_time_stepper_temporal_order(timestepper, chi, order):
    e1 = _decay_error(timestepper, 1.0 / 16, chi)
    e2 = _decay_error(timestepper, 1.0 / 32, chi)
    measured = np.log2(e1 / e2)
    assert measured > order - 0.35, (measured, e1, e2)


# -- full-model cosine advection-diffusion (reference
# validation/convergence_tests/one_dimensional_advection_diffusion.jl) -----
def _adv_diff_error(n):
    from clima_oceananigans_jl_tpu import CENTER
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)
    from clima_oceananigans_jl_tpu.closures.scalar_diffusivity import (
        ScalarDiffusivity)
    U, kappa, t_end = 1.0, 2e-2, 0.25
    g = RectilinearGrid(size=(n, 1, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
    model = NonhydrostaticModel(g, tracers=("c",),
                                advection=CenteredSecondOrder(),
                                timestepper="RungeKutta3",
                                closure=ScalarDiffusivity(nu=0.0, kappa=kappa))
    g = model.grid
    k = 2 * np.pi
    state = model.initial_state(u=U, c=lambda x, y, z: jnp.sin(k * x))
    dt = 0.25 / 512  # fixed tiny dt: isolates the spatial error
    nsteps = round(t_end / dt)
    step = jax.jit(model.step)
    for _ in range(nsteps):
        state = step(state, jnp.float64(dt))
    xc = np.asarray(g.coord(0, "c"))
    exact = np.exp(-kappa * k * k * t_end) * np.sin(k * (xc - U * t_end))
    got = np.asarray(g.interior(state["solution"]["c"]))[:, 0, 0]
    return np.abs(got - exact).max()


def test_model_advection_diffusion_spatial_order():
    """The full model (advection + diffusion + projection + RK3) converges
    at 2nd order on the travelling decaying cosine."""
    e1 = _adv_diff_error(16)
    e2 = _adv_diff_error(32)
    measured = np.log2(e1 / e2)
    assert measured > 1.7, (measured, e1, e2)
    assert e2 < 1e-2


def test_positive_weno5_flux_limiter():
    """PositiveWENO5 (reference PositiveWENO: the Zhang-Shu flux-level
    limiter) keeps a [0,1] square wave STRICTLY inside its bounds
    through a full revolution at CFL 0.2, at the same L1 accuracy as
    plain WENO5 — and with wide bounds it degenerates to plain WENO5
    (θ ≡ 1), preserving 5th-order accuracy."""
    from clima_oceananigans_jl_tpu.advection.schemes import PositiveWENO5
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)

    n = 96
    results = {}
    for name, scheme in (("weno5", WENO5()),
                         ("positive", PositiveWENO5(bounds=(0.0, 1.0)))):
        g = RectilinearGrid(size=(n, 1, 1), x=(0, 1), y=(0, 1),
                            topology=(PERIODIC, FLAT, FLAT), halo=(4, 1, 1),
                            dtype=jnp.float64)
        model = NonhydrostaticModel(g, tracers=("c",), tracer_advection=scheme,
                                    advection=CenteredSecondOrder(),
                                    timestepper="RungeKutta3")
        gi = model.grid
        sq = lambda x: jnp.where((x > 0.3) & (x < 0.7), 1.0, 0.0)
        state = model.initial_state(u=1.0, c=lambda x, y, z: sq(x))
        dt = jnp.float64(0.2 / n)
        step = jax.jit(model.step)
        cmin, cmax = 0.0, 1.0
        for _ in range(round(1.0 / float(dt))):
            state = step(state, dt)
            ci = gi.interior(state["solution"]["c"])
            cmin = min(cmin, float(ci.min()))
            cmax = max(cmax, float(ci.max()))
        got = np.asarray(gi.interior(state["solution"]["c"]))[:, 0, 0]
        exact = np.asarray(sq(jnp.asarray(gi.coord(0, "c"))))
        results[name] = (cmin, cmax, np.abs(got - exact).mean())
    assert results["positive"][0] > -1e-10        # strict lower bound
    assert results["positive"][1] < 1.0 + 1e-10   # strict upper bound
    assert results["weno5"][1] > 1.0 + 1e-5       # plain WENO does overshoot
    assert results["positive"][2] < 1.2 * results["weno5"][2]  # same accuracy

    # inactive limiter (wide bounds) keeps the 5th-order smooth accuracy
    e1 = advection_error(PositiveWENO5(bounds=(-100.0, 100.0)), 32)
    e2 = advection_error(PositiveWENO5(bounds=(-100.0, 100.0)), 64)
    assert np.log2(e1 / e2) > 4.65, np.log2(e1 / e2)
