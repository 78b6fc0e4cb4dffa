"""Cubed-sphere grid tests (model: /root/reference/test/test_cubed_spheres.jl:
area/metric sanity, inter-face halo continuity, tracer conservation)."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu.grids.cubed_sphere import (
    CubedSphereGrid, cubed_sphere_tracer_step,
)
from clima_oceananigans_jl_tpu.advection.schemes import CenteredSecondOrder, WENO5
from clima_oceananigans_jl_tpu.utils.location import C, CENTER


def test_total_area_is_sphere_area():
    g = CubedSphereGrid(size=(16, 16, 1), radius=1.0, dtype=jnp.float64)
    fg = g.face_grids()
    az = fg.Az(CENTER)  # (6, n, n, 1) with halos
    H = g.H
    total = float(jnp.sum(az[:, H:H + g.N, H:H + g.N]))
    assert abs(total - 4 * np.pi) / (4 * np.pi) < 1e-3


def test_halo_exchange_continuity():
    """Fill interiors with a smooth function of 3D position; after the
    exchange, halo values must match the function at the halo node's own
    position to bilinear-interpolation accuracy (the reference's rank-id
    analog for faces)."""
    g = CubedSphereGrid(size=(16, 16, 1), radius=1.0, dtype=jnp.float64)
    pos = np.asarray(g._centers3d)  # (6, n, n, 3) incl halos
    f3 = lambda p: np.sin(2 * p[..., 0]) + 0.5 * p[..., 1] * p[..., 2]
    data = jnp.zeros(g.total_shape, jnp.float64)
    H = g.H
    vals = jnp.asarray(f3(pos))[..., None]
    data = data.at[:, H:H + g.N, H:H + g.N, :].set(
        vals[:, H:H + g.N, H:H + g.N])
    filled = g.fill_halos(data)
    got = np.asarray(filled)[..., 0]
    expect = f3(pos)
    # all non-corner halo nodes must match exactly (nodes coincide)
    n = g.N + 2 * H
    mask = np.zeros((n, n), bool)
    mask[H:H + g.N, :H] = True; mask[H:H + g.N, H + g.N:] = True
    mask[:H, H:H + g.N] = True; mask[H + g.N:, H:H + g.N] = True
    err = np.abs(got[:, mask] - expect[None, mask][0] if False else
                 got[:, mask] - np.stack([expect[f][mask] for f in range(6)]))
    assert err.max() < 5e-3  # O(dx^2) bilinear interpolation accuracy


def test_solid_body_rotation_conserves_tracer():
    g = CubedSphereGrid(size=(16, 16, 1), radius=1.0, dtype=jnp.float64)
    pos = np.asarray(g._centers3d)
    # solid-body rotation about z: V = Ω ẑ × r; project onto local bases
    omega = 1.0
    V = omega * np.stack([-pos[..., 1], pos[..., 0], np.zeros_like(pos[..., 0])],
                         axis=-1)
    e1 = np.gradient(pos, axis=1)
    e2 = np.gradient(pos, axis=2)
    e1 /= np.linalg.norm(e1, axis=-1, keepdims=True)
    e2 /= np.linalg.norm(e2, axis=-1, keepdims=True)
    u = jnp.asarray((V * e1).sum(-1))[..., None]
    v = jnp.asarray((V * e2).sum(-1))[..., None]
    lon = np.asarray(g.longitude)
    lat = np.asarray(g.latitude)
    c0 = jnp.asarray(np.exp(-((lat - 20) ** 2 + (lon - 0) ** 2) / 400.0))[..., None]

    fg = g.face_grids()
    H = g.H
    vol = fg.V(CENTER)[:, H:H + g.N, H:H + g.N]
    total0 = float(jnp.sum(g.interior(c0 * fg.V(CENTER))))

    step = jax.jit(lambda c: cubed_sphere_tracer_step(
        g, c, u, v, 2e-3, CenteredSecondOrder()))
    c = c0
    for _ in range(100):
        c = step(c)
    c_np = np.asarray(c)
    assert np.all(np.isfinite(c_np))
    total = float(jnp.sum(g.interior(c * fg.V(CENTER))))
    # interpolated inter-face halos are not exactly flux-conservative;
    # drift stays below ~1% over 100 steps at this resolution
    assert abs(total - total0) / abs(total0) < 2e-2
    # the blob should have moved but kept its amplitude roughly
    assert 0.3 < c_np.max() < 1.3


def test_conformal_map_properties():
    """The conformal map is conformal (w_y = i w_x), maps edges onto the
    inter-face great circles, and sends the square corner to the cube
    corner (1,1,1)/sqrt(3). Uniqueness of the conformal map makes this
    THE Rancic et al. (1996) map the reference uses via CubedSphere.jl."""
    from clima_oceananigans_jl_tpu.grids.conformal_map import (
        conformal_cubed_sphere_mapping, conformal_to_stereographic)
    X, Y, Z = conformal_cubed_sphere_mapping(1.0, 1.0)
    assert abs(X - 1/np.sqrt(3)) < 1e-7 and abs(Z - 1/np.sqrt(3)) < 1e-7
    X, Y, Z = conformal_cubed_sphere_mapping(1.0, 0.0)
    assert abs(X - 1/np.sqrt(2)) < 1e-7 and abs(Z - 1/np.sqrt(2)) < 1e-7
    eps = 1e-6
    for (x0, y0) in [(0.3, 0.2), (-0.7, 0.5)]:
        wx = (conformal_to_stereographic(x0+eps + 1j*y0)
              - conformal_to_stereographic(x0-eps + 1j*y0)) / (2*eps)
        wy = (conformal_to_stereographic(x0 + 1j*(y0+eps))
              - conformal_to_stereographic(x0 + 1j*(y0-eps))) / (2*eps)
        assert abs(wy - 1j*wx) / abs(wx) < 1e-8
    for t in np.linspace(-0.9, 0.9, 7):
        Xp, Yp, Zp = conformal_cubed_sphere_mapping(1.0, t)
        assert abs(Xp - Zp) < 1e-7  # edge on great circle X=Z


def test_exact_rotated_halo_exchange():
    """Every halo node (scalar AND both velocity components) is an exact
    rotated index copy of a neighbour node — the analog of the
    reference's cubed_sphere_halo_filling.jl exact copies, verified by
    filling interiors with analytic fields of 3D position."""
    from clima_oceananigans_jl_tpu.utils.location import C, F
    g = CubedSphereGrid(size=(16, 16, 1), radius=1.0, dtype=jnp.float64,
                        halo=2)
    N, H = g.N, g.H
    # all ACTIVE map entries (nonzero rotation coefficient) must be
    # one-hot with quarter-turn rotations
    for loc in ((C, C), (F, C), (C, F)):
        m = g._maps[loc]
        for r, wx, wy in ((m.rA, m.wxA, m.wyA), (m.rB, m.wxB, m.wyB)):
            r = np.asarray(r)
            act = np.abs(r) > 1e-12
            assert (np.abs(r - np.round(r)) < 1e-6).all()
            for w in (np.asarray(wx), np.asarray(wy)):
                off = np.minimum(np.abs(w), np.abs(1 - w))
                assert (off[act] < 1e-6).all()
    # scalar: analytic field of position reproduces halos exactly
    def ffun(p):
        return p[..., 0] * p[..., 1] + p[..., 2] ** 2 + 0.3 * p[..., 0]
    c = jnp.asarray(np.stack([ffun(g._nodes(f, (C, C)))
                              for f in range(6)])[..., None])
    c0 = (c * 0.0).at[:, H:H+N, H:H+N].set(c[:, H:H+N, H:H+N])
    assert np.abs(np.asarray(g.fill_halos(c0) - c)).max() < 1e-12


def test_cubed_sphere_tracer_conservation_exact():
    """With the exact exchange, the advective tracer step conserves
    total tracer mass (sum c * Az) to roundoff."""
    g = CubedSphereGrid(size=(16, 16, 1), radius=1.0, dtype=jnp.float64,
                        halo=3)
    from clima_oceananigans_jl_tpu.advection.schemes import UpwindBiasedThirdOrder
    N, H = g.N, g.H
    rng = np.random.RandomState(0)
    n = N + 2 * H
    c = jnp.zeros((6, n, n, 1)).at[:, H:H+N, H:H+N, 0].set(
        rng.rand(6, N, N))
    u = jnp.zeros_like(c).at[:, H:H+N, H:H+N, 0].set(0.1 * rng.randn(6, N, N))
    v = jnp.zeros_like(c).at[:, H:H+N, H:H+N, 0].set(0.1 * rng.randn(6, N, N))
    az = g._az[(jnp.zeros(1).dtype and __import__("clima_oceananigans_jl_tpu.utils.location", fromlist=["C"]).C,) * 2] \
        if False else g._az[list(g._az)[0]]
    from clima_oceananigans_jl_tpu.utils.location import C as _C
    az = g._az[(_C, _C)]
    mass0 = float(jnp.sum(g.interior(c) * g.interior(jnp.broadcast_to(az[..., None] if az.ndim == 3 else az, c.shape))))
    cs = c
    for _ in range(3):
        cs = cubed_sphere_tracer_step(g, cs, u, v, 1e-3,
                                      UpwindBiasedThirdOrder())
    mass1 = float(jnp.sum(g.interior(cs) * g.interior(jnp.broadcast_to(az[..., None] if az.ndim == 3 else az, c.shape))))
    assert abs(mass1 - mass0) < 1e-10 * abs(mass0)


def test_grid_file_roundtrip(tmp_path):
    """to_file/from_file reproduces metrics and the model step exactly
    (reference: ConformalCubedSphereGrid is constructed from a grid
    file, conformal_cubed_sphere_face_grid.jl)."""
    import jax.numpy as jnp
    from clima_oceananigans_jl_tpu.models.cubed_sphere_hydrostatic import (
        CubedSphereHydrostaticModel)
    from clima_oceananigans_jl_tpu.utils.location import C as LC

    g1 = CubedSphereGrid(size=(8, 8, 1), radius=6.371e6, dtype=jnp.float64,
                         halo=3)
    path = str(tmp_path / "cs8.npz")
    g1.to_file(path)
    g2 = CubedSphereGrid.from_file(path, dtype=jnp.float64)
    assert g2.N == g1.N and g2.H == g1.H and g2.Nz == g1.Nz
    assert np.allclose(np.asarray(g1._az[(LC, LC)]),
                       np.asarray(g2._az[(LC, LC)]))

    def run(g):
        model = CubedSphereHydrostaticModel(g, depth=1000.0)
        state = model.initial_state(
            eta=lambda p: 0.5 * p[..., 2] / np.linalg.norm(p, axis=-1))
        state = jax.jit(model.step)(state, jnp.float64(60.0))
        return np.asarray(state["eta"])

    assert np.allclose(run(g1), run(g2), atol=0.0)
