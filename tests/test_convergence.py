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
