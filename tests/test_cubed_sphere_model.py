"""Hydrostatic model on the cubed sphere (VERDICT round-2 item 3:
reference hooks HydrostaticFreeSurfaceModel onto ConformalCubedSphereGrid,
src/CubedSpheres/CubedSpheres.jl:17-36). Tests: Williamson-2-style steady
geostrophic solid-body flow, barotropic gravity wave with volume
conservation, and a jitted multi-level step with a tracer."""
import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu.grids.cubed_sphere import CubedSphereGrid
from clima_oceananigans_jl_tpu.models.cubed_sphere_hydrostatic import (
    CubedSphereHydrostaticModel)

R_E = 6.371e6
OMEGA = 7.292115e-5


def test_solid_body_geostrophic_steady():
    """Williamson et al. (1992) test 2: zonal solid-body flow with the
    balancing free surface is a steady state; the discrete solution must
    stay close to it."""
    g = CubedSphereGrid(size=(24, 24, 1), radius=R_E, dtype=jnp.float64,
                        halo=3)
    u0 = 20.0
    gg = 9.80665

    def vel(p):
        # zonal solid-body flow: V = Omega_vec x p with Omega_vec = u0/R ẑ
        n = p / np.linalg.norm(p, axis=-1, keepdims=True)
        return np.cross([0.0, 0.0, u0], n)

    def eta0(p):
        n = p / np.linalg.norm(p, axis=-1, keepdims=True)
        sinphi = n[..., 2]
        return -(R_E * OMEGA * u0 + 0.5 * u0 ** 2) * sinphi ** 2 / gg

    model = CubedSphereHydrostaticModel(g, gravitational_acceleration=gg,
                                        depth=4000.0)
    state = model.initial_state(u=vel, eta=eta0)
    u_init = np.asarray(g.interior(state["solution"]["u"]))
    eta_init = np.asarray(state["eta"][:, g.H:g.H + g.N, g.H:g.H + g.N])
    dt = 100.0
    step = jax.jit(model.step)
    for _ in range(60):
        state = step(state, dt)
    u_fin = np.asarray(g.interior(state["solution"]["u"]))
    assert np.isfinite(u_fin).all()
    # the flow magnitude stays put (no instability) ...
    assert np.abs(u_fin).max() < 1.05 * u0
    # ... the l2 drift is at truncation level (localized corner noise
    # dominates the max norm; Williamson-style tests use l2) ...
    l2 = np.sqrt(((u_fin - u_init) ** 2).mean()) / np.sqrt((u_init ** 2).mean())
    assert l2 < 0.03, l2
    # ... and the free surface stays near balance
    eta_fin = np.asarray(state["eta"][:, g.H:g.H + g.N, g.H:g.H + g.N])
    assert np.abs(eta_fin - eta_init).max() < 0.15 * np.abs(eta_init).max()


def test_barotropic_gravity_wave_conserves_volume():
    g = CubedSphereGrid(size=(16, 16, 1), radius=R_E, dtype=jnp.float64,
                        halo=3)
    model = CubedSphereHydrostaticModel(g, coriolis_rotation_rate=0.0,
                                        depth=4000.0)

    def eta0(p):
        n = p / np.linalg.norm(p, axis=-1, keepdims=True)
        return 1.0 * np.exp(-((n[..., 0] - 1.0) ** 2 + n[..., 1] ** 2
                              + n[..., 2] ** 2) / 0.05)

    state = model.initial_state(eta=eta0)
    from clima_oceananigans_jl_tpu.utils.location import C
    az = np.asarray(g._az[(C, C)][:, g.H:g.H + g.N, g.H:g.H + g.N, 0])
    core = lambda e: np.asarray(e[:, g.H:g.H + g.N, g.H:g.H + g.N, 0])
    vol0 = float((core(state["eta"]) * az).sum())
    step = jax.jit(model.step)
    for _ in range(60):
        state = step(state, 600.0)
    eta = core(state["eta"])
    assert np.isfinite(eta).all()
    vol1 = float((eta * az).sum())
    assert abs(vol1 - vol0) < 1e-9 * max(1.0, abs(vol0))
    # the gravity wave (c = sqrt(gH) ~ 200 m/s over 4e4 s) must have
    # radiated the bump away: peak well below the initial amplitude
    assert eta.max() < 0.7 * core(model.initial_state(eta=eta0)["eta"]).max()


def test_multilevel_step_with_tracer_jits():
    g = CubedSphereGrid(size=(8, 8, 4), z=(-100.0, 0.0), radius=R_E,
                        dtype=jnp.float32, halo=3)
    model = CubedSphereHydrostaticModel(g, tracers=("c",))

    def c0(p):
        n = p / np.linalg.norm(p, axis=-1, keepdims=True)
        return np.exp(-((n[..., 0] - 1.0) ** 2) / 0.1)

    def vel(p):
        n = p / np.linalg.norm(p, axis=-1, keepdims=True)
        return np.cross([0.0, 0.0, 1.0], n)

    state = model.initial_state(u=vel, c=c0)
    assert state["solution"]["u"].shape == g.total_shape
    state = jax.jit(model.step)(state, 50.0)
    for arr in (state["solution"]["u"], state["solution"]["c"], state["eta"]):
        assert np.isfinite(np.asarray(arr)).all()


def test_cubed_sphere_faces_shard_over_devices():
    """Multi-device cubed sphere: the (6, X, Y, Z) face axis shards over a
    6-device mesh under plain jit — GSPMD inserts the inter-face gather
    collectives for the halo exchange (the TPU analog of the reference's
    MultiRegion cubed sphere, one face per GPU); bit-identical to the
    single-device step and the output stays face-sharded."""
    import pytest
    if len(jax.devices()) < 6:
        pytest.skip("needs 6 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    N = 16
    g = CubedSphereGrid(size=(N, N, 1), radius=R_E, dtype=jnp.float64, halo=3)
    model = CubedSphereHydrostaticModel(g, tracers=("c",), depth=1000.0)
    U0 = 38.0

    def vel(p):
        n = p / np.linalg.norm(p, axis=-1, keepdims=True)
        return np.cross([0.0, 0.0, U0], n)

    state = model.initial_state(
        u=vel,
        eta=lambda p: -0.5 * (p[..., 2] / np.linalg.norm(p, axis=-1)) ** 2,
        c=lambda p: p[..., 0] / np.linalg.norm(p, axis=-1))
    dt = jnp.float64(50.0)
    step = jax.jit(model.step)
    s1 = state
    for _ in range(3):
        s1 = step(s1, dt)

    mesh = Mesh(np.array(jax.devices()[:6]), ("f",))
    shard = lambda x: (jax.device_put(x, NamedSharding(mesh, P("f")))
                       if getattr(x, "ndim", 0) >= 3 and x.shape[0] == 6 else x)
    s2 = jax.tree_util.tree_map(shard, state)
    for _ in range(3):
        s2 = jax.jit(model.step)(s2, dt)

    for n in ("u", "v", "c"):
        a = np.asarray(s1["solution"][n])
        b = np.asarray(s2["solution"][n])
        assert np.allclose(a, b, atol=1e-12), n
    assert "f" in str(s2["solution"]["u"].sharding)
