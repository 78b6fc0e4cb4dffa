"""In-place Pallas periodic fills: bit-equality with the XLA slab path
(interpret mode on CPU; aliasing preserves unwritten regions there too)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid
from clima_oceananigans_jl_tpu.boundary_conditions.bcs import (default_bcs,
                                                               fill_halos)
from clima_oceananigans_jl_tpu.ops import fused_fill
from clima_oceananigans_jl_tpu.utils.location import CENTER, U_LOC


@pytest.fixture(autouse=True)
def _force_inplace():
    fused_fill.FORCE_INPLACE = True
    yield
    fused_fill.FORCE_INPLACE = None


def _rand(shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float64)


@pytest.mark.parametrize("halo", [(4, 4, 3), (8, 8, 3)])
def test_periodic_xy_matches_slab_fill(halo):
    grid = RectilinearGrid(size=(16, 24, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           halo=halo, dtype=jnp.float64)
    assert fused_fill.supports_inplace_fill(grid, 0)
    assert fused_fill.supports_inplace_fill(grid, 1)
    data = _rand(grid.total_shape)
    bcs = default_bcs(grid, CENTER)
    ref = fill_halos(data, grid, CENTER, bcs, axes=(0, 1, 2))
    got = fused_fill.fill_halos_fast(data, grid, CENTER, bcs, axes=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_periodic_x_permuted_layout():
    grid = RectilinearGrid(size=(16, 24, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, BOUNDED, BOUNDED),
                           halo=(4, 4, 3), dtype=jnp.float64)
    perm = (0, 2, 1)  # (x, z, y) storage
    xt, yt, zt = grid.total_shape
    data = _rand((xt, zt, yt))
    bcs = default_bcs(grid, U_LOC)
    ref = fill_halos(data, grid, U_LOC, bcs, axes=(0, 1, 2), perm=perm)
    got = fused_fill.fill_halos_fast(data, grid, U_LOC, bcs,
                                     axes=(0, 1, 2), perm=perm)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_lane_axis_falls_back():
    grid = RectilinearGrid(size=(16, 24, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, PERIODIC),
                           halo=(4, 4, 3), dtype=jnp.float64)
    # z is the lane dim in natural layout: unsupported, must fall back
    assert not fused_fill.supports_inplace_fill(grid, 2)
    data = _rand(grid.total_shape)
    ref = fill_halos(data, grid, CENTER, None, axes=(0, 1, 2))
    got = fused_fill.fill_halos_fast(data, grid, CENTER, None,
                                     axes=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vmem_tiling_path():
    # force the budget low enough that _tile_dim engages
    grid = RectilinearGrid(size=(32, 32, 16), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           halo=(4, 4, 3), dtype=jnp.float64)
    data = _rand(grid.total_shape)
    orig = fused_fill._tile_dim
    fused_fill._tile_dim = lambda s, p, w, i, budget=4_000_000: orig(
        s, p, w, i, budget=20_000)
    try:
        got = fused_fill.fill_halos_fast(data, grid, CENTER, None,
                                         axes=(0, 1))
    finally:
        fused_fill._tile_dim = orig
    ref = fill_halos(data, grid, CENTER, None, axes=(0, 1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_production_fill_halos_routes_inplace(monkeypatch):
    """ADVICE r4: `fill_halos` itself (the production entry every model
    uses) routes eligible periodic axes through the in-place kernels —
    verified bit-identical against the pure XLA path here."""
    grid = RectilinearGrid(size=(16, 24, 8), extent=(1., 1., 1.),
                           topology=(PERIODIC, PERIODIC, BOUNDED),
                           halo=(4, 4, 3), dtype=jnp.float64)
    data = _rand(grid.total_shape)
    bcs = default_bcs(grid, CENTER)
    monkeypatch.setenv("CLIMA_NO_INPLACE_FILL", "1")
    ref = fill_halos(data, grid, CENTER, bcs, axes=(0, 1, 2))
    monkeypatch.delenv("CLIMA_NO_INPLACE_FILL")
    got = fill_halos(data, grid, CENTER, bcs, axes=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tile_dim_alignment():
    """ADVICE r4: _tile_dim must never emit unaligned sublane offsets or
    lane tiling; over-budget single windows are the legal fallback."""
    # p=0 fill of a big (X, Y, Z) block: tiling dim 1 is the SUBLANE dim
    # → tile must be a multiple of 8 (or the full dim)
    d, t = fused_fill._tile_dim((512, 264, 256), 0, 8, 4)
    if d is not None:
        assert d == 1 and (t % 8 == 0 or t == 264), (d, t)
    # Y=262 has no 8-divisible divisor: must fall back to one window,
    # never an unaligned sublane tile
    d, t = fused_fill._tile_dim((512, 262, 256), 0, 8, 4)
    assert d is None and t is None
    # p=1 fill: dim 0 is leading (free) — any divisor legal
    d, t = fused_fill._tile_dim((512, 264, 256), 1, 8, 4)
    assert d in (None, 0)
