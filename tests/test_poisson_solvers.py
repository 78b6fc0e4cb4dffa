"""Poisson solver tests (model: /root/reference/test/test_poisson_solvers.jl)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, CENTER, U_LOC, V_LOC, W_LOC,
    fill_halos,
)
from clima_oceananigans_jl_tpu.ops import operators as op
from clima_oceananigans_jl_tpu.solvers.fft_poisson import FFTPoissonSolver
from clima_oceananigans_jl_tpu.solvers.fourier_tridiagonal import FourierTridiagonalSolver
from clima_oceananigans_jl_tpu.solvers.tridiagonal import solve_batched_tridiagonal

TOPOS = [PERIODIC, BOUNDED]


@pytest.mark.parametrize("tx,ty,tz", list(itertools.product(TOPOS, TOPOS, TOPOS)))
def test_fft_solver_satisfies_discrete_poisson(tx, ty, tz):
    n = (8, 8, 8)
    g = RectilinearGrid(size=n, extent=(1.0, 1.3, 0.7), topology=(tx, ty, tz),
                        dtype=jnp.float64)
    rng = np.random.default_rng(42)
    rhs = rng.standard_normal(n)
    rhs -= rhs.mean()
    solver = FFTPoissonSolver.build(g)
    phi_int = solver.solve(jnp.asarray(rhs))
    # embed and check ∇²φ = rhs via the FV laplacian
    phi = jnp.zeros(g.total_shape, jnp.float64)
    sl = tuple(slice(h, h + m) for h, m in zip(g.halo, g.shape))
    phi = phi.at[sl].set(phi_int)
    phi = fill_halos(phi, g, CENTER)
    lap = np.asarray(g.interior(op.laplacian(phi, g)))
    assert np.allclose(lap, rhs, atol=1e-9)


@pytest.mark.parametrize("tx,ty", [(PERIODIC, PERIODIC), (PERIODIC, BOUNDED),
                                   (BOUNDED, BOUNDED)])
def test_fourier_tridiagonal_on_stretched_z(tx, ty):
    faces = np.concatenate([[0.0], np.cumsum(np.random.default_rng(3).uniform(0.5, 1.5, 8))])
    g = RectilinearGrid(size=(8, 8, 8), x=(0, 1), y=(0, 1), z=faces,
                        topology=(tx, ty, BOUNDED), dtype=jnp.float64)
    rng = np.random.default_rng(7)
    rhs = rng.standard_normal((8, 8, 8))
    # make rhs volume-mean-free (compatibility for pure-Neumann problem)
    w = np.asarray(g.interior(jnp.broadcast_to(g.V(CENTER), g.total_shape)))
    rhs -= (rhs * w).sum() / w.sum()
    solver = FourierTridiagonalSolver.build(g)
    phi_int = solver.solve(jnp.asarray(rhs))
    phi = jnp.zeros(g.total_shape, jnp.float64)
    sl = tuple(slice(h, h + m) for h, m in zip(g.halo, g.shape))
    phi = phi.at[sl].set(phi_int)
    phi = fill_halos(phi, g, CENTER)
    lap = np.asarray(g.interior(op.laplacian(phi, g)))
    assert np.allclose(lap, rhs, atol=1e-8)


@pytest.mark.parametrize("topo", [(PERIODIC, PERIODIC, PERIODIC),
                                  (PERIODIC, PERIODIC, BOUNDED),
                                  (BOUNDED, BOUNDED, BOUNDED)])
def test_divergence_free_projection(topo):
    """Random u* → projection → ∇·u ≈ 0 (reference test :45-84)."""
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
    g = RectilinearGrid(size=(16, 16, 16), extent=(1, 1, 1), topology=topo,
                        dtype=jnp.float64)
    model = NonhydrostaticModel(grid=g)
    rng = np.random.default_rng(0)
    state = model.initial_state(
        u=rng.standard_normal((16, 16, 16)),
        v=rng.standard_normal((16, 16, 16)),
        w=rng.standard_normal((16, 16, 16)))
    state = model.project_velocities(state, jnp.float64(1.0))
    sol = model.fill_all_halos(state["solution"])
    div = op.div_ccc(sol["u"], sol["v"], sol["w"], model.grid)
    assert np.max(np.abs(np.asarray(model.grid.interior(div)))) < 1e-10


def test_poisson_solver_second_order_convergence():
    """cos(2πx) RHS → analytic solution, 2nd-order (reference :87-91)."""
    errs = []
    for n in (16, 32, 64):
        g = RectilinearGrid(size=(n, 1, 1), x=(0, 1), y=(0, 1),
                            topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
        x = np.asarray(g.coord(0, "c"))
        rhs = -(2 * np.pi) ** 2 * np.cos(2 * np.pi * x).reshape(n, 1, 1)
        solver = FFTPoissonSolver.build(g)
        phi = np.asarray(solver.solve(jnp.asarray(rhs)))[:, 0, 0]
        exact = np.cos(2 * np.pi * x)
        errs.append(np.max(np.abs(phi - exact)))
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    assert r1 > 1.9 and r2 > 1.9


def test_odd_sized_fft_solver():
    g = RectilinearGrid(size=(11, 13, 7), extent=(1, 1, 1),
                        topology=(PERIODIC, BOUNDED, BOUNDED), dtype=jnp.float64)
    rng = np.random.default_rng(1)
    rhs = rng.standard_normal((11, 13, 7))
    rhs -= rhs.mean()
    solver = FFTPoissonSolver.build(g)
    phi_int = solver.solve(jnp.asarray(rhs))
    phi = jnp.zeros(g.total_shape, jnp.float64)
    sl = tuple(slice(h, h + m) for h, m in zip(g.halo, g.shape))
    phi = phi.at[sl].set(phi_int)
    phi = fill_halos(phi, g, CENTER)
    lap = np.asarray(g.interior(op.laplacian(phi, g)))
    assert np.allclose(lap, rhs, atol=1e-9)


def test_batched_tridiagonal_vs_dense():
    rng = np.random.default_rng(5)
    nz = 10
    a = rng.uniform(0.5, 1.0, nz)
    b = rng.uniform(3.0, 4.0, nz)
    c = rng.uniform(0.5, 1.0, nz)
    a[0] = 0.0
    c[-1] = 0.0
    d = rng.standard_normal((4, 3, nz))
    phi = np.asarray(solve_batched_tridiagonal(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d)))
    M = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    for i in range(4):
        for j in range(3):
            expected = np.linalg.solve(M, d[i, j])
            assert np.allclose(phi[i, j], expected, atol=1e-12)


def test_mxu_dct_matrix_matches_fft_dct():
    """The MXU-matmul DCT used on TPU equals jax.scipy.fft.dct."""
    import jax.scipy.fft as jfft
    from clima_oceananigans_jl_tpu.solvers.fft_poisson import (
        _dct2_matrix, _matmul_along)
    b = jax.random.normal(jax.random.PRNGKey(3), (6, 5, 16), jnp.float64)
    for ax in (0, 1, 2):
        ref = jfft.dct(b, type=2, axis=ax, norm="ortho")
        got = _matmul_along(b, _dct2_matrix(b.shape[ax], b.dtype), ax)
        assert np.abs(np.asarray(ref - got)).max() < 1e-12
        inv = _matmul_along(got, _dct2_matrix(b.shape[ax], b.dtype).T, ax)
        assert np.abs(np.asarray(inv - b)).max() < 1e-12


@pytest.mark.parametrize("tx,ty,tz", list(itertools.product(TOPOS, TOPOS, TOPOS)))
def test_fft_solver_mxu_matmul_path(tx, ty, tz):
    """The all-matmul transform path (real-DFT / DCT on the MXU; the
    production path on TPU) must agree with the FFT lowering."""
    from clima_oceananigans_jl_tpu.solvers import fft_poisson as fp
    n = (8, 12, 10)
    g = RectilinearGrid(size=n, extent=(1.0, 1.3, 0.7), topology=(tx, ty, tz),
                        dtype=jnp.float64)
    rng = np.random.default_rng(11)
    rhs = jnp.asarray(rng.standard_normal(n))
    rhs = rhs - rhs.mean()
    solver = FFTPoissonSolver.build(g)
    try:
        fp.FORCE_MXU = True
        phi_mm = solver.solve(rhs)
    finally:
        fp.FORCE_MXU = None
    phi_fft = solver.solve(rhs)
    np.testing.assert_allclose(np.asarray(phi_mm), np.asarray(phi_fft),
                               atol=1e-9)
    # and an odd size exercises the no-Nyquist-row branch
    n = (7, 7, 7)
    g = RectilinearGrid(size=n, extent=(1.0, 1.0, 1.0),
                        topology=(tx, ty, tz), dtype=jnp.float64)
    rhs = jnp.asarray(np.random.default_rng(12).standard_normal(n))
    rhs = rhs - rhs.mean()
    solver = FFTPoissonSolver.build(g)
    try:
        fp.FORCE_MXU = True
        phi_mm = solver.solve(rhs)
    finally:
        fp.FORCE_MXU = None
    np.testing.assert_allclose(np.asarray(phi_mm), np.asarray(solver.solve(rhs)),
                               atol=1e-9)


@pytest.mark.parametrize("tx,ty", [(PERIODIC, PERIODIC), (PERIODIC, BOUNDED),
                                   (BOUNDED, BOUNDED)])
def test_fourier_tridiagonal_mxu_matmul_path(tx, ty):
    from clima_oceananigans_jl_tpu.solvers import fft_poisson as fp
    faces = np.concatenate(
        [[0.0], np.cumsum(np.random.default_rng(5).uniform(0.5, 1.5, 8))])
    g = RectilinearGrid(size=(8, 8, 8), x=(0, 1), y=(0, 1), z=faces,
                        topology=(tx, ty, BOUNDED), dtype=jnp.float64)
    rhs = np.random.default_rng(9).standard_normal((8, 8, 8))
    w = np.asarray(g.interior(jnp.broadcast_to(g.V(CENTER), g.total_shape)))
    rhs -= (rhs * w).sum() / w.sum()
    solver = FourierTridiagonalSolver.build(g)
    try:
        fp.FORCE_MXU = True
        phi_mm = solver.solve(jnp.asarray(rhs))
    finally:
        fp.FORCE_MXU = None
    phi_fft = solver.solve(jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(phi_mm), np.asarray(phi_fft),
                               atol=1e-9)
