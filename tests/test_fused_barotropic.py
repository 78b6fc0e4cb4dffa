"""Whole-loop barotropic substep kernel (ops/fused_barotropic.py):
interpret-mode equivalence vs the XLA fori_loop path of
SplitExplicitFreeSurface.substep_eta, and the full split-explicit step
with the kernel engaged."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from clima_oceananigans_jl_tpu import BOUNDED, PERIODIC, RectilinearGrid
from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.free_surface import (
    SplitExplicitFreeSurface, barotropic_mode, column_depths)
from clima_oceananigans_jl_tpu.ops import fused_barotropic as fb


def _substep_both(grid, n=6, eta_bcs=None):
    fs = SplitExplicitFreeSurface(substeps=n)
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    shp = grid.total_shape[:2] + (1,)
    eta0 = 0.1 * jax.random.normal(k1, shp, grid.dtype)
    U0 = jax.random.normal(k2, shp, grid.dtype)
    V0 = jax.random.normal(k3, shp, grid.dtype)
    GU = 1e-3 * jax.random.normal(k4, shp, grid.dtype)
    GV = 1e-3 * jax.random.normal(k5, shp, grid.dtype)
    dt = jnp.asarray(50.0, grid.dtype)

    assert fb.fused_substep_ok(grid, eta_bcs), "gate should admit this config"
    os.environ["CLIMA_FUSED_BAROTROPIC_INTERPRET"] = "1"
    try:
        out_fused = fs.substep_eta(grid, eta_bcs, eta0, GU, GV, U0, V0, dt)
    finally:
        del os.environ["CLIMA_FUSED_BAROTROPIC_INTERPRET"]
    os.environ["CLIMA_NO_FUSED_BAROTROPIC"] = "1"
    try:
        out_xla = fs.substep_eta(grid, eta_bcs, eta0, GU, GV, U0, V0, dt)
    finally:
        del os.environ["CLIMA_NO_FUSED_BAROTROPIC"]
    return out_fused, out_xla


@pytest.mark.parametrize("grid_kind", ["latlon", "rect_periodic",
                                       "rect_bounded_xy", "latlon_value_bc"])
def test_fused_substep_matches_xla_loop_bitwise(grid_kind):
    """Every BC/topology class the gate admits must be equivalence-
    tested: periodic wraps, bounded zero-gradient mirrors (x AND y), and
    the scalar Value-BC concat slab path."""
    eta_bcs = None
    if grid_kind.startswith("latlon"):
        zf = [-100.0 * (1 - (k / 4.0) ** 1.5) for k in range(5)]
        grid = LatitudeLongitudeGrid(size=(16, 12, 4), longitude=(0, 360),
                                     latitude=(-60, 60), z=zf,
                                     dtype=jnp.float64)
        if grid_kind == "latlon_value_bc":
            from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (
                FieldBCs, ValueBC)
            eta_bcs = FieldBCs(south=ValueBC(0.25), north=ValueBC(-0.5))
    elif grid_kind == "rect_bounded_xy":
        grid = RectilinearGrid(size=(16, 12, 4), extent=(1e5, 1e5, 100.0),
                               topology=(BOUNDED, BOUNDED, BOUNDED),
                               dtype=jnp.float64)
    else:
        grid = RectilinearGrid(size=(16, 12, 4), extent=(1e5, 1e5, 100.0),
                               topology=(PERIODIC, PERIODIC, BOUNDED),
                               dtype=jnp.float64)
    (ef, uf, vf), (ex, ux, vx) = _substep_both(grid, eta_bcs=eta_bcs)
    for name, a, b in (("eta", ef, ex), ("U", uf, ux), ("V", vf, vx)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            grid_kind, name, np.abs(np.asarray(a) - np.asarray(b)).max())


def test_fused_substep_gate_rejects_unsafe():
    from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (
        FieldBCs, GradientBC)
    grid = LatitudeLongitudeGrid(size=(16, 12, 4), longitude=(0, 360),
                                 latitude=(-60, 60), z=(-100.0, 0.0),
                                 dtype=jnp.float64)
    assert fb.fused_substep_ok(grid, None)
    # nonzero-gradient BC builds a node-distance array constant — a
    # Mosaic kernel cannot capture it, so the gate must reject
    bcs = FieldBCs(south=GradientBC(1e-3), north=GradientBC(1e-3))
    assert not fb.fused_substep_ok(grid, bcs)


def test_full_split_explicit_step_with_fused_kernel(monkeypatch):
    """HydrostaticFreeSurfaceModel.step with the fused barotropic kernel
    (interpret) vs the XLA loop — identical states after several steps."""
    from clima_oceananigans_jl_tpu.models.hydrostatic import (
        HydrostaticFreeSurfaceModel)
    from clima_oceananigans_jl_tpu.coriolis.coriolis import (
        HydrostaticSphericalCoriolis)
    from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
    from clima_oceananigans_jl_tpu.advection.vector_invariant import (
        VectorInvariant)
    from clima_oceananigans_jl_tpu.advection.schemes import WENO5

    def run(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        try:
            grid = LatitudeLongitudeGrid(size=(16, 12, 4),
                                         longitude=(0, 360),
                                         latitude=(-60, 60), z=(-100.0, 0),
                                         dtype=jnp.float64)
            m = HydrostaticFreeSurfaceModel(
                grid, momentum_advection=VectorInvariant("weno_velocity"),
                tracer_advection=WENO5(), tracers=("T",),
                free_surface=SplitExplicitFreeSurface(substeps=6),
                coriolis=HydrostaticSphericalCoriolis(),
                buoyancy=BuoyancyTracer())
            s = m.initial_state(
                u=lambda lam, phi, z: 0.05 * jnp.cos(jnp.deg2rad(phi)),
                b=lambda lam, phi, z: 1e-5 * z,
                T=lambda lam, phi, z: 10.0 + 1e-3 * z)
            step = jax.jit(m.step)
            for _ in range(3):
                s = step(s, jnp.float64(100.0))
            return s
        finally:
            for k in env:
                monkeypatch.delenv(k)

    s1 = run({"CLIMA_FUSED_BAROTROPIC_INTERPRET": "1"})
    s0 = run({"CLIMA_NO_FUSED_BAROTROPIC": "1"})
    for name in ("u", "v", "T", "b"):
        a = np.asarray(s1["solution"][name])
        b = np.asarray(s0["solution"][name])
        assert np.array_equal(a, b), (name, np.abs(a - b).max())
    assert np.array_equal(np.asarray(s1["eta"]), np.asarray(s0["eta"]))
