"""Vertically-implicit diffusion tests
(model: /root/reference/test/test_turbulence_closures.jl implicit-diffusion
checks + vertically_implicit_diffusion_solver.jl semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, ScalarDiffusivity,
)
from clima_oceananigans_jl_tpu.closures.implicit_vertical_diffusion import (
    implicit_vertical_diffusion_step,
)
from clima_oceananigans_jl_tpu.models.nonhydrostatic import NonhydrostaticModel
from clima_oceananigans_jl_tpu.utils.location import CENTER, W_LOC


def test_implicit_solve_matches_dense_backward_euler():
    """One implicit step equals the dense (I − Δt L) solve on a stretched grid."""
    Nz, kappa, dt = 17, 0.7, 0.3
    faces = np.concatenate([[0.0], np.cumsum(np.random.RandomState(0).uniform(0.5, 1.5, Nz))])
    g = RectilinearGrid(size=(1, 1, Nz), x=(0, 1), y=(0, 1), z=faces,
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    rng = np.random.RandomState(1)
    c0 = rng.randn(Nz)
    data = jnp.zeros(g.total_shape, jnp.float64).at[0, 0, g.Hz:g.Hz + Nz].set(c0)

    out = implicit_vertical_diffusion_step(data, g, CENTER, kappa, dt)
    got = np.asarray(out[0, 0, g.Hz:g.Hz + Nz])

    # dense operator: L c |_k = (κ (c_{k+1}−c_k)/Δzf_{k+1} − κ (c_k−c_{k−1})/Δzf_k)/Δzc_k
    dzc = np.asarray(g._axes[2].dc[g.Hz:g.Hz + Nz])
    dzf = np.asarray(g._axes[2].df[g.Hz:g.Hz + Nz + 1])
    L = np.zeros((Nz, Nz))
    for k in range(Nz):
        if k > 0:
            L[k, k - 1] += kappa / (dzc[k] * dzf[k])
            L[k, k] -= kappa / (dzc[k] * dzf[k])
        if k < Nz - 1:
            L[k, k + 1] += kappa / (dzc[k] * dzf[k + 1])
            L[k, k] -= kappa / (dzc[k] * dzf[k + 1])
    expected = np.linalg.solve(np.eye(Nz) - dt * L, c0)
    assert np.allclose(got, expected, atol=1e-12)


def test_implicit_diffusion_conserves_tracer_and_decays():
    """Neumann walls conserve ∫c dz; variance decays."""
    Nz = 32
    g = RectilinearGrid(size=(1, 1, Nz), x=(0, 1), y=(0, 1), z=(0, 1),
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    z = np.asarray(g.coord(2, "c"))
    c0 = np.cos(np.pi * z)
    data = jnp.zeros(g.total_shape, jnp.float64).at[0, 0, g.Hz:g.Hz + Nz].set(c0)
    dzc = np.asarray(g._axes[2].dc[g.Hz:g.Hz + Nz])

    out = data
    for _ in range(10):
        out = implicit_vertical_diffusion_step(out, g, CENTER, 1.0, 0.5)
    got = np.asarray(out[0, 0, g.Hz:g.Hz + Nz])
    assert abs(np.sum(got * dzc) - np.sum(c0 * dzc)) < 1e-12
    assert np.sum(got**2) < 1e-3 * np.sum(c0**2)  # strongly decayed, stable at huge dt


def test_implicit_w_solve_preserves_boundary_faces():
    Nz = 16
    g = RectilinearGrid(size=(1, 1, Nz), x=(0, 1), y=(0, 1), z=(0, 1),
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    rng = np.random.RandomState(2)
    data = jnp.zeros(g.total_shape, jnp.float64)
    data = data.at[0, 0, g.Hz + 1: g.Hz + Nz].set(rng.randn(Nz - 1))
    out = implicit_vertical_diffusion_step(data, g, W_LOC, 0.5, 0.2)
    assert float(out[0, 0, g.Hz]) == 0.0           # bottom face untouched
    assert float(out[0, 0, g.Hz + Nz]) == 0.0      # top face untouched
    assert not np.allclose(np.asarray(out[0, 0, g.Hz + 1: g.Hz + Nz]),
                           np.asarray(data[0, 0, g.Hz + 1: g.Hz + Nz]))


def test_model_with_vertically_implicit_closure_runs_stably():
    """Column model with huge κ_z and dt ≫ explicit stability limit."""
    Nz = 32
    g = RectilinearGrid(size=(1, 1, Nz), x=(0, 1), y=(0, 1), z=(0, 100),
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    model = NonhydrostaticModel(
        grid=g, tracers=("T",),
        closure=ScalarDiffusivity(nu=1e-2, kappa=1e-2, nu_z=10.0, kappa_z=10.0,
                                  time_discretization="vertically_implicit"))
    state = model.initial_state(T=lambda x, y, z: 20.0 + 1e-2 * z)
    step = jax.jit(model.step)
    dt = jnp.float64(50.0)  # explicit limit would be ~Δz²/2κ ≈ 0.5
    for _ in range(5):
        state = step(state, dt)
    T = np.asarray(model.grid.interior(state["solution"]["T"]))
    assert np.all(np.isfinite(T))
    assert T.min() >= 20.0 - 1e-8 and T.max() <= 21.0 + 1e-8


def test_implicit_solve_honors_value_and_gradient_walls():
    """Value (Dirichlet) and Gradient wall BCs are folded into the
    implicit vertical solve: a diffusion-only column relaxes to the
    exact steady profile (the reference's ivd solver hardwires zero-flux
    walls; see implicit_vertical_diffusion.py docstring)."""
    import jax
    from clima_oceananigans_jl_tpu import FieldBCs, GradientBC, ValueBC
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)

    nz, kappa = 32, 0.5
    grid = RectilinearGrid(size=(4, 1, nz), x=(0, 1), y=(0, 1), z=(0.0, 1.0),
                           topology=(PERIODIC, FLAT, BOUNDED),
                           dtype=jnp.float64)
    model = NonhydrostaticModel(
        grid, tracers=("c", "d"), advection=None,
        closure=ScalarDiffusivity(nu=0.0, kappa=kappa,
                                  time_discretization="vertically_implicit"),
        boundary_conditions={
            "c": FieldBCs(bottom=ValueBC(1.0), top=ValueBC(3.0)),
            # steady state with bottom value 2, top gradient 4: c = 2 + 4z
            "d": FieldBCs(bottom=ValueBC(2.0), top=GradientBC(4.0)),
        })
    g = model.grid
    state = model.initial_state()
    dt = jnp.float64(0.05)  # implicit: far above the explicit limit
    step = jax.jit(model.step)
    for _ in range(500):  # mixed Dirichlet/Neumann mode decays ~4x slower
        state = step(state, dt)
    zc = np.asarray(g.coord(2, "c"))
    c = np.asarray(g.interior(state["solution"]["c"])).mean((0, 1))
    d = np.asarray(g.interior(state["solution"]["d"])).mean((0, 1))
    assert np.abs(c - (1.0 + 2.0 * zc)).max() < 1e-8
    assert np.abs(d - (2.0 + 4.0 * zc)).max() < 1e-8


def test_scalar_band_fast_path_matches_3d_bands_bitwise():
    """solve_batched_tridiagonal's 1D (z-only) band fast path must be
    bit-identical to the same bands broadcast to (X, Y, Nz) — the
    constant-coefficient implicit step relies on it (the per-element
    arithmetic is the same either way; only the band storage differs)."""
    from clima_oceananigans_jl_tpu.solvers.tridiagonal import (
        solve_batched_tridiagonal)
    rng = np.random.default_rng(9)
    for dtype in (jnp.float64, jnp.float32):
        nz = 12
        a = jnp.asarray(-np.abs(rng.normal(size=nz)), dtype).at[0].set(0.0)
        c = jnp.asarray(-np.abs(rng.normal(size=nz)), dtype).at[-1].set(0.0)
        b = 1.0 - a - c
        d = jnp.asarray(rng.normal(size=(10, 7, nz)), dtype)
        fast = solve_batched_tridiagonal(a, b, c, d)
        full = solve_batched_tridiagonal(
            jnp.broadcast_to(a, d.shape), jnp.broadcast_to(b, d.shape),
            jnp.broadcast_to(c, d.shape), d)
        assert np.array_equal(np.asarray(fast), np.asarray(full)), dtype
