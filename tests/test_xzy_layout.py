"""(x, z, y) hydrostatic state layout: step-for-step equivalence with the
natural (x, y, z) layout.

The shallow-z storage layout (models/hydrostatic.py _pick_state_layout,
ops/permuted.py) changes WHERE values live, never what they are: fills,
w-from-continuity, pHY', the fused kernel, and the free-surface updates
all run the same expression trees on permuted axes. These tests pin that
equivalence on CPU (fused kernels in interpret mode) for the flagship
configuration family.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clima_oceananigans_jl_tpu.grids.latlon import LatitudeLongitudeGrid
from clima_oceananigans_jl_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from clima_oceananigans_jl_tpu.models.free_surface import (
    ImplicitFreeSurface, SplitExplicitFreeSurface)
from clima_oceananigans_jl_tpu.coriolis.coriolis import HydrostaticSphericalCoriolis
from clima_oceananigans_jl_tpu.buoyancy.buoyancy import BuoyancyTracer
from clima_oceananigans_jl_tpu.advection.vector_invariant import VectorInvariant
from clima_oceananigans_jl_tpu.advection.schemes import WENO5


def _grid():
    k = np.arange(9)
    z_faces = -1000.0 * (1.0 - k / 8) ** 1.5
    return LatitudeLongitudeGrid(size=(32, 64, 8), longitude=(0, 360),
                                 latitude=(-60, 60), z=z_faces,
                                 dtype=jnp.float64)


def _model(grid, fs, **kw):
    return HydrostaticFreeSurfaceModel(
        grid, momentum_advection=VectorInvariant(scheme="weno_velocity"),
        tracer_advection=WENO5(), tracers=("T",),
        free_surface=fs, coriolis=HydrostaticSphericalCoriolis(),
        buoyancy=BuoyancyTracer(), fused_advection=True, **kw)


def _init(model):
    g = model.grid
    key = jax.random.PRNGKey(7)
    ku, kv, kb = jax.random.split(key, 3)
    return model.initial_state(
        u=0.05 * jax.random.normal(ku, g.shape, g.dtype),
        v=0.05 * jax.random.normal(kv, g.shape, g.dtype),
        b=1e-4 * jax.random.normal(kb, g.shape, g.dtype),
        T=lambda lam, phi, z: 10.0 + 1e-3 * z)


@pytest.mark.parametrize("fs", [
    SplitExplicitFreeSurface(substeps=8),
    ImplicitFreeSurface(solver_method="pcg", tolerance=1e-12),
])
def test_xzy_layout_matches_natural(fs, monkeypatch):
    grid = _grid()
    m_xzy = _model(grid, fs)
    assert m_xzy.state_layout == "xzy", "gate should engage for this config"
    monkeypatch.setenv("CLIMA_NO_XZY", "1")
    m_nat = _model(grid, fs)
    assert m_nat.state_layout is None
    monkeypatch.delenv("CLIMA_NO_XZY")

    s_x = _init(m_xzy)
    s_n = _init(m_nat)
    # state really is stored permuted
    xt, yt, zt = m_xzy.grid.total_shape
    assert s_x["solution"]["u"].shape == (xt, zt, yt)
    assert s_n["solution"]["u"].shape == (xt, yt, zt)

    dt = jnp.asarray(200.0, grid.dtype)
    step_x = jax.jit(m_xzy.step)
    step_n = jax.jit(m_nat.step)
    for _ in range(3):
        s_x = step_x(s_x, dt)
        s_n = step_n(s_n, dt)

    f_x = m_xzy.fields(s_x)
    f_n = m_nat.fields(s_n)
    for name in ("u", "v", "w", "T", "b", "eta"):
        a = np.asarray(f_x[name].data)
        b = np.asarray(f_n[name].data)
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-13,
                                   err_msg=name)


def test_xzy_gate_declines_unsupported():
    grid = _grid()
    # a forcing pulls the step off the layout-aware path
    m = _model(grid, SplitExplicitFreeSurface(substeps=4),
               forcing={"T": lambda g, clock, fields: jnp.zeros(g.total_shape,
                                                                g.dtype)})
    assert m.state_layout is None


def test_xzy_diagnostics_unpermuted():
    grid = _grid()
    m = _model(grid, SplitExplicitFreeSurface(substeps=4))
    if m.state_layout is None:
        pytest.skip("layout gate off")
    s = _init(m)
    ts = m.cell_advection_timescale(s)
    assert np.isfinite(float(ts)) and float(ts) > 0
