"""Stretched-grid WENO coefficient tables (VERDICT round-2 item 7;
reference weno_fifth_order.jl:21-60 stretched reconstruction tuples).

Checks: the tables degenerate to the uniform constants on a regular
mesh; finite-volume reconstruction on a smoothly-stretched mesh
converges at (better than) 4th order and beats the uniform-coefficient
scheme; and a stretched-z nonhydrostatic WENO5 model steps finitely
through the table path under jit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import BOUNDED, PERIODIC, RectilinearGrid, WENO5
from clima_oceananigans_jl_tpu.advection.reconstruction_tables import (
    _build_tables, weno5_tables)


def test_uniform_tables_match_constant_coefficients():
    P = jnp.asarray(np.arange(32, dtype=np.float64) * 0.37)
    tab = _build_tables(P, to_f=True)
    sl = slice(3, -3)
    # optimal weights (0.1, 0.6, 0.3) on both sides
    for side in ("left", "right"):
        for (entry, d_ref) in zip(tab[side], (0.1, 0.6, 0.3)):
            np.testing.assert_allclose(np.asarray(entry[0])[sl], d_ref,
                                       atol=1e-12)
    # left stencil coefficients (ascending cells): p0 = (2, -7, 11)/6,
    # p1 = (-1, 5, 2)/6, p2 = (2, 5, -1)/6  (schemes.WENO5._weno_left)
    expect_left = [np.array([2, -7, 11]) / 6.0,
                   np.array([-1, 5, 2]) / 6.0,
                   np.array([2, 5, -1]) / 6.0]
    for (entry, ref) in zip(tab["left"], expect_left):
        got = np.stack([np.asarray(c)[sl] for c in entry[1]], -1)
        np.testing.assert_allclose(got - ref[None, :], 0.0, atol=1e-11)
    # right side mirrors: p0 = (11, -7, 2)/6 on cells (i, i+1, i+2)
    expect_right = [np.array([11, -7, 2]) / 6.0,
                    np.array([2, 5, -1]) / 6.0,
                    np.array([-1, 5, 2]) / 6.0]
    for (entry, ref) in zip(tab["right"], expect_right):
        got = np.stack([np.asarray(c)[sl] for c in entry[1]], -1)
        np.testing.assert_allclose(got - ref[None, :], 0.0, atol=1e-11)
    # value offsets
    assert [e[2] for e in tab["left"]] == [[-3, -2, -1], [-2, -1, 0], [-1, 0, 1]]
    assert [e[2] for e in tab["right"]] == [[0, 1, 2], [-1, 0, 1], [-2, -1, 0]]


def _stretched_grid(n):
    xi = np.linspace(0.0, 1.0, n + 1)
    faces = xi + 0.25 * np.sin(np.pi * xi) / np.pi
    return RectilinearGrid(size=(n, 1, 1), x=faces,
                           topology=(BOUNDED, "flat", "flat"),
                           dtype=jnp.float64)


def _recon_error(n, use_tables):
    g = _stretched_grid(n)
    a = g._axes[0]
    cf = np.asarray(a.cf, np.float64)
    dc = np.asarray(a.dc, np.float64)
    k = 2.0 * np.pi
    # exact cell averages of sin(kx): (cos(k a) - cos(k b)) / (k dx)
    avg = (np.cos(k * cf) - np.cos(k * (cf + dc))) / (k * dc)
    v = jnp.asarray(avg)
    scheme = WENO5()
    if use_tables:
        tab = weno5_tables(g, 0, True)
        assert tab is not None
        rec = scheme.table_reconstruct(v, 0, tab, "left")
    else:
        rec = scheme.left_to_f(v, 0)
    h, N = a.h, a.n
    sl = slice(h, h + N + 1)  # interior faces incl. the top bounded face
    err = np.asarray(rec)[sl] - np.sin(k * cf[sl])
    # drop faces whose 5-cell stencil reaches outside the physical
    # domain (halo cells are extrapolated geometry, not data)
    return np.abs(err[3:-3]).max()


def test_stretched_reconstruction_convergence():
    errs = {n: _recon_error(n, True) for n in (32, 64, 128)}
    order1 = np.log2(errs[32] / errs[64])
    order2 = np.log2(errs[64] / errs[128])
    assert order2 > 3.7, (errs, order1, order2)
    # geometry-exact tables beat uniform coefficients on the same mesh
    assert errs[128] < 0.5 * _recon_error(128, False)


def test_uniform_axis_returns_no_tables():
    g = RectilinearGrid(size=(8, 1, 1), extent=(1.0,),
                        topology=(PERIODIC, "flat", "flat"))
    assert weno5_tables(g, 0, True) is None


def test_stretched_z_model_steps_through_tables():
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)
    n = 16
    xi = np.linspace(-1.0, 0.0, n + 1)
    zf = xi + 0.2 * np.sin(np.pi * xi) / np.pi
    g = RectilinearGrid(size=(n, n, n), x=(0.0, 1.0), y=(0.0, 1.0), z=zf,
                        topology=(PERIODIC, PERIODIC, BOUNDED),
                        dtype=jnp.float64)
    model = NonhydrostaticModel(g, advection=WENO5(), buoyancy=BuoyancyTracer())
    assert not model.grid.z_regular
    u0 = 1e-2 * jax.random.normal(jax.random.PRNGKey(1), g.shape, g.dtype)
    state = model.initial_state(u=u0)
    step = jax.jit(model.step)
    for _ in range(5):
        state = step(state, 1e-3)
    for name, arr in state["solution"].items():
        assert np.isfinite(np.asarray(arr)).all(), name
