"""Step compilation with TPU layout pinning.

On TPU, XLA's automatic entry-layout assignment picks the physical
layout it likes for each jit boundary array. For the hydrostatic
model's shallow-z (x, z, y) state (``state_layout == "xzy"``,
models/hydrostatic.py) it picks ``{2,0,1}`` — z outermost — while
Mosaic requires the default row-major ``{2,1,0}`` for every Pallas
operand/result, so EVERY kernel input is relayout-copied on the way in
and every output on the way out (~2 GB/step of pure copies at the ¼°
flagship; the HLO shows them as ``copy``/``copy-start`` pairs around
each ``tpu_custom_call``). Pinning row-major at the jit boundary
removes them all: measured 37.7 → 32.3 ms/step (551 → 642 M pts/s) at
1440×600×24.

``compile_step(model, state, dt)`` returns ``(step_fn, state)`` — the
jitted step with pinned in/out layouts where that matters (and the
state re-laid-out to match, so the first compile already sees the final
layouts). Models/backends where XLA's choice already coincides with the
kernels' get a plain ``jax.jit``.
"""
from __future__ import annotations

import jax


def _state_device(state):
    """The device the state currently lives on (first committed leaf),
    falling back to the default device — compile_step must not silently
    migrate a user-placed single-chip state to device 0."""
    for leaf in jax.tree_util.tree_leaves(state):
        devs = getattr(leaf, "devices", None)
        if callable(devs):
            try:
                ds = devs()
                if len(ds) == 1:
                    return next(iter(ds))
            except Exception:
                pass
    return jax.devices()[0]


def _row_major_format(device):
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    return Format(Layout((0, 1, 2)), SingleDeviceSharding(device))


def _wants_pinning(model):
    return (jax.default_backend() == "tpu"
            and getattr(model, "state_layout", None) == "xzy")


def format_state(model, state):
    """Re-lay-out the 3D leaves of ``state`` to the kernels' row-major
    layout (no-op unless the model wants pinning)."""
    if not _wants_pinning(model):
        return state
    fmt = _row_major_format(_state_device(state))

    def put(x):
        if getattr(x, "ndim", 0) == 3:
            return jax.device_put(x, fmt)
        return x
    return jax.tree_util.tree_map(put, state)


def compile_step(model, state, dt=None, donate=False):
    """``(step_fn, state)``: jitted ``model.step`` with row-major layouts
    pinned at the boundary when the model's Pallas kernels need it."""
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if not _wants_pinning(model):
        fn = jax.jit(model.step, donate_argnums=0 if donate else ())
        return fn, state
    from jax.sharding import SingleDeviceSharding
    dev = _state_device(state)
    fmt = _row_major_format(dev)
    plain = SingleDeviceSharding(dev)
    state = format_state(model, state)
    if dt is None:
        dt = model.grid.dtype(0.0)
    out_sh = jax.tree_util.tree_map(
        lambda s: fmt if len(s.shape) == 3 else plain,
        jax.eval_shape(model.step, state, dt))
    # pin the ENTRY layouts too: with only out_shardings pinned, XLA
    # auto-chooses the entry layouts, and when its choice differs from
    # the row-major arrays the previous step produced, every call pays a
    # relayout of the whole donated state — measured catastrophically
    # slow through the axon relay (seconds/step at ¼°; plain jit 35 ms)
    in_sh = jax.tree_util.tree_map(
        lambda x: fmt if getattr(x, "ndim", 0) == 3 else plain, state)
    fn = jax.jit(model.step, donate_argnums=0 if donate else (),
                 in_shardings=(in_sh, plain), out_shardings=out_sh)
    return fn, state
