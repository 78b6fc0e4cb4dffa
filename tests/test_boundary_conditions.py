"""Halo-filling and flux BC tests (model: reference test_boundary_conditions.jl,
test_halo_regions.jl)."""
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import (
    BOUNDED, FLAT, PERIODIC, RectilinearGrid, C, F, CENTER, U_LOC, W_LOC,
    CenterField, ZFaceField, FieldBCs, ValueBC, GradientBC, FluxBC, OpenBC,
    set_field, fill_halos, apply_flux_bcs, regularize_bcs,
)


def _grid1d(topo, n=8, h=2):
    return RectilinearGrid(size=(1, 1, n), x=(0, 1), y=(0, 1), z=(0.0, float(n)),
                           halo=(0, 0, h), topology=(FLAT, FLAT, topo),
                           dtype=jnp.float64)


def test_periodic_halo_fill():
    g = _grid1d(PERIODIC)
    f = CenterField(g)
    vals = jnp.arange(8.0)
    f = set_field(f, g, vals.reshape(1, 1, 8))
    d = np.asarray(f.data)[0, 0]
    assert np.allclose(d[:2], [6, 7])
    assert np.allclose(d[-2:], [0, 1])


def test_value_bc_ghost_midpoint():
    g = _grid1d(BOUNDED)
    bcs = FieldBCs(bottom=ValueBC(10.0), top=ValueBC(-4.0))
    f = CenterField(g, bcs)
    f = set_field(f, g, 2.0)
    d = np.asarray(f.data)[0, 0]
    # ghost + interior average = boundary value
    assert np.isclose(0.5 * (d[g.Hz - 1] + d[g.Hz]), 10.0)
    assert np.isclose(0.5 * (d[g.Hz + 8] + d[g.Hz + 7]), -4.0)


def test_gradient_bc():
    g = _grid1d(BOUNDED)
    bcs = FieldBCs(bottom=GradientBC(3.0), top=GradientBC(3.0))
    f = CenterField(g, bcs)
    f = set_field(f, g, lambda x, y, z: 3.0 * z)
    d = np.asarray(f.data)[0, 0]
    # one-sided difference across boundary reproduces the gradient exactly
    assert np.isclose((d[g.Hz] - d[g.Hz - 1]) / 1.0, 3.0)
    assert np.isclose((d[g.Hz + 8] - d[g.Hz + 7]) / 1.0, 3.0)


def test_zero_flux_default_is_even_reflection():
    g = _grid1d(BOUNDED)
    f = set_field(CenterField(g), g, lambda x, y, z: z * z)
    d = np.asarray(f.data)[0, 0]
    assert np.isclose(d[g.Hz - 1], d[g.Hz])
    assert np.isclose(d[g.Hz - 2], d[g.Hz + 1])


def test_open_bc_face_field():
    g = _grid1d(BOUNDED)
    w = set_field(ZFaceField(g), g, lambda x, y, z: z + 1.0)
    d = np.asarray(w.data)[0, 0]
    # impenetrable default: boundary faces zeroed
    assert np.isclose(d[g.Hz], 0.0)
    assert np.isclose(d[g.Hz + 8], 0.0)
    # odd reflection below the wall
    assert np.isclose(d[g.Hz - 1], -d[g.Hz + 1])


def test_flux_bc_tendency_application():
    g = _grid1d(BOUNDED, n=4)
    bcs = regularize_bcs(g, CENTER, FieldBCs(top=FluxBC(2.0), bottom=FluxBC(0.5)))
    G = jnp.zeros(g.total_shape, jnp.float64)
    G = apply_flux_bcs(G, g, CENTER, bcs)
    d = np.asarray(G)[0, 0]
    # Δz = 1: bottom flux adds +q/Δz at first cell, top subtracts
    assert np.isclose(d[g.Hz], 0.5)
    assert np.isclose(d[g.Hz + 3], -2.0)
    assert np.allclose(d[g.Hz + 1: g.Hz + 3], 0.0)


def test_functional_bc_value():
    g = RectilinearGrid(size=(4, 1, 4), x=(0, 4), y=(0, 1), z=(0, 4),
                        topology=(PERIODIC, FLAT, BOUNDED), dtype=jnp.float64)
    bcs = FieldBCs(top=ValueBC(lambda x, y, t: x))
    f = CenterField(g, bcs)
    f = set_field(f, g, 0.0)
    d = np.asarray(f.data)
    xc = np.asarray(g.coord(0, C))
    top_ghost = d[g.Hx:g.Hx + 4, 0, g.Hz + 4]
    interior = d[g.Hx:g.Hx + 4, 0, g.Hz + 3]
    assert np.allclose(0.5 * (top_ghost + interior), xc)


def test_flux_bc_tracer_budget_integration():
    """Integrated flux-BC budget (reference
    test_boundary_conditions_integration.jl): with a constant top flux Q
    and a bottom flux of opposite sign, the domain tracer content
    changes at exactly (Q_top − Q_bot)·A·t, for both explicit and
    vertically-implicit diffusion."""
    import jax
    from clima_oceananigans_jl_tpu.models.nonhydrostatic import (
        NonhydrostaticModel)
    from clima_oceananigans_jl_tpu import ScalarDiffusivity, CENTER

    for td in ("explicit", "vertically_implicit"):
        g = RectilinearGrid(size=(4, 4, 16), x=(0, 2.0), y=(0, 3.0),
                            z=(-1.0, 0.0),
                            topology=(PERIODIC, PERIODIC, BOUNDED),
                            dtype=jnp.float64)
        model = NonhydrostaticModel(
            g, tracers=("c",), advection=None,
            closure=ScalarDiffusivity(nu=0.0, kappa=1e-3,
                                      time_discretization=td),
            boundary_conditions={"c": FieldBCs(top=FluxBC(2.5),
                                               bottom=FluxBC(1.0))})
        gi = model.grid
        state = model.initial_state(c=1.0)
        dt, n = jnp.float64(1e-2), 50
        step = jax.jit(model.step)
        for _ in range(n):
            state = step(state, dt)
        vol = np.asarray(jnp.broadcast_to(gi.V(CENTER), gi.total_shape))
        c = np.asarray(state["solution"]["c"])
        sl = tuple(slice(h, h + s) for h, s in zip(gi.halo, gi.shape))
        total = (c * vol)[sl].sum()
        total0 = 1.0 * 2.0 * 3.0 * 1.0
        area, t = 2.0 * 3.0, n * float(dt)
        # sign convention: positive top flux removes tracer, positive
        # bottom flux adds it (see validation/vertical_mixing_closures)
        expected = total0 + (1.0 - 2.5) * area * t
        assert np.isclose(total, expected, rtol=1e-12), (total, expected, td)
