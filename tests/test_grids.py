"""Grid geometry tests (model: /root/reference/test/test_grids.jl)."""
import jax.numpy as jnp
import numpy as np
import pytest

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, C, F, CENTER,
)


def test_regular_grid_spacings_and_extent():
    g = RectilinearGrid(size=(8, 6, 4), extent=(16.0, 12.0, 2.0),
                        topology=(PERIODIC, PERIODIC, BOUNDED), dtype=jnp.float64)
    assert g.shape == (8, 6, 4)
    assert g.Lx == 16.0 and g.Ly == 12.0 and g.Lz == 2.0
    assert np.allclose(np.asarray(g._axes[0].dc), 2.0)
    assert np.allclose(np.asarray(g._axes[2].dc), 0.5)
    assert g.all_regular
    xc = np.asarray(g.coord(0, C))
    assert np.allclose(xc, np.arange(1.0, 16.0, 2.0))
    xf = np.asarray(g.coord(0, F))
    assert np.allclose(xf, np.arange(0.0, 15.0, 2.0))


def test_interval_kwargs():
    g = RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(-1, 1), z=(-3, 0),
                        topology=(PERIODIC, BOUNDED, BOUNDED), dtype=jnp.float64)
    assert np.isclose(g.Lx, 1.0) and np.isclose(g.Ly, 2.0) and np.isclose(g.Lz, 3.0)
    zf = np.asarray(g.coord(2, F))
    assert np.isclose(zf[0], -3.0)


def test_stretched_grid():
    faces = np.array([0.0, 1.0, 3.0, 6.0, 10.0])
    g = RectilinearGrid(size=(4, 1, 4), extent=(1.0,), z=faces,
                        topology=(PERIODIC, FLAT, BOUNDED), dtype=jnp.float64)
    assert not g.z_regular and g.x_regular and g.hregular
    dzc = np.asarray(g._axes[2].dc)[g.Hz: g.Hz + 4]
    assert np.allclose(dzc, [1.0, 2.0, 3.0, 4.0])
    zc = np.asarray(g.coord(2, C))
    assert np.allclose(zc, [0.5, 2.0, 4.5, 8.0])


def test_stretched_grid_from_function():
    g = RectilinearGrid(size=(1, 1, 8), x=(0, 1), y=(0, 1),
                        z=lambda k: -(1 - (k / 8) ** 2) * 100,
                        topology=(FLAT, FLAT, BOUNDED), dtype=jnp.float64)
    zf = np.asarray(g.coord(2, F))
    assert np.isclose(zf[0], -100.0)


def test_periodic_halo_extension_wraps_spacings():
    faces = np.array([0.0, 1.0, 3.0, 6.0, 10.0])
    g = RectilinearGrid(size=(4, 1, 1), x=faces, halo=(2, 0, 0),
                        topology=(PERIODIC, FLAT, FLAT), dtype=jnp.float64)
    dc = np.asarray(g._axes[0].dc)
    # halo spacings wrap: left halos see the last interior spacings
    assert np.allclose(dc[:2], [3.0, 4.0])
    assert np.allclose(dc[-2:], [1.0, 2.0])


def test_flat_axes():
    g = RectilinearGrid(size=(8, 1, 1), extent=(1.0,),
                        topology=(PERIODIC, FLAT, FLAT))
    assert g.total_shape == (8 + 2 * g.Hx, 1, 1)
    assert g.Hy == 0 and g.Hz == 0


def test_with_halo():
    g = RectilinearGrid(size=(8, 8, 8), extent=(1, 1, 1),
                        topology=(PERIODIC, PERIODIC, BOUNDED), halo=(1, 1, 1),
                        dtype=jnp.float64)
    g2 = g.with_halo((3, 3, 3))
    assert g2.halo == (3, 3, 3)
    assert np.allclose(np.asarray(g2.coord(0, C)), np.asarray(g.coord(0, C)))
    assert np.allclose(np.asarray(g2.coord(2, F)), np.asarray(g.coord(2, F)))


def test_grid_is_pytree():
    import jax
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1), dtype=jnp.float64)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2.shape == g.shape and g2.topology == g.topology

    @jax.jit
    def vol(grid):
        return jnp.sum(grid.interior(jnp.broadcast_to(grid.V(CENTER), grid.total_shape)))

    assert np.isclose(float(vol(g)), 1.0)
