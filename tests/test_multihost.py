"""Multi-host helpers (VERDICT round-2 item 9): jax.distributed init
wrapper, DCN×ICI-aware pod mesh construction, sharded checkpointing
(reference src/Distributed/multi_architectures.jl:9-16 analog)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clima_oceananigans_jl_tpu import PERIODIC, BOUNDED, RectilinearGrid
from clima_oceananigans_jl_tpu.parallel.multihost import (
    initialize_distributed, load_sharded_checkpoint, mesh_device_array,
    pod_mesh, save_sharded_checkpoint)


@dataclasses.dataclass(frozen=True)
class FakeDev:
    process_index: int
    id: int


def test_initialize_distributed_single_process_noop():
    pid, n = initialize_distributed()
    assert (pid, n) == (0, 1)


def test_mesh_device_array_keeps_y_rings_within_process():
    # 2 processes × 4 devices, mesh (4, 2): each y-ring (row) must live
    # inside one process so y-ppermutes stay on ICI
    devs = [FakeDev(p, i) for p in range(2) for i in range(4)]
    arr = mesh_device_array(devs, (4, 2))
    assert arr.shape == (4, 2)
    for row in arr:
        procs = {d.process_index for d in row}
        assert len(procs) == 1
    # processes tile the outer x axis contiguously
    assert [row[0].process_index for row in arr] == [0, 0, 1, 1]


def test_mesh_device_array_fallback_when_indivisible():
    # 3 devices per process cannot host ny=2 rings: falls back to simple
    # order, still the right shape
    devs = [FakeDev(p, i) for p in range(2) for i in range(3)]
    arr = mesh_device_array(devs, (3, 2))
    assert arr.shape == (3, 2)


def test_pod_mesh_runs_distributed_model():
    from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
    from clima_oceananigans_jl_tpu.parallel.distributed import DistributedModel
    mesh = pod_mesh((2, 2))
    g = RectilinearGrid(size=(32, 32, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, PERIODIC, "flat"),
                        halo=(3, 3, 0), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, gravitational_acceleration=10.0)
    dm = DistributedModel(model, mesh)
    state = dm.initial_state(
        uh=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x), h=1.0)
    state = dm.step(state, 1e-3)
    leaves = jax.tree_util.tree_leaves(state)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_sharded_checkpoint_roundtrip(tmp_path):
    from clima_oceananigans_jl_tpu.models.shallow_water import ShallowWaterModel
    from clima_oceananigans_jl_tpu.parallel.distributed import DistributedModel
    mesh = pod_mesh((2, 2))
    g = RectilinearGrid(size=(16, 16, 1), x=(0, 1), y=(0, 1),
                        topology=(PERIODIC, PERIODIC, "flat"),
                        halo=(3, 3, 0), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, gravitational_acceleration=10.0)
    dm = DistributedModel(model, mesh)
    state = dm.initial_state(
        uh=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x), h=1.0)
    state = dm.step(state, 1e-3)
    path = str(tmp_path / "ckpt")
    save_sharded_checkpoint(path, state, mesh)
    restored = load_sharded_checkpoint(path, state, mesh)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state steps identically to the original
    s1 = dm.step(state, 1e-3)
    s2 = dm.step(restored, 1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
