"""In-place periodic halo fills as aliased Pallas strip kernels.

XLA's slab-update halo fill (boundary_conditions/bcs.py fill_halos) is
correct but not in-place on TPU: each dynamic-update-slice whose update
is computed from the SAME buffer forces a defensive whole-array copy, so
one x+y fill of a 256³ field streams ~0.5 GB instead of the ~4 MB the
halo strips actually hold. HLO accounting of the hydrostatic ¼° step
(benchmark/hydro_hlo.py) shows ~12 GB/step of this DUS/slice/copy
traffic.

Here each periodic axis fill is a `pallas_call` whose OUTPUT IS THE
INPUT (``input_output_aliases``): only the halo strip windows are
written, everything else is untouched memory. Strip windows respect the
TPU tiling alignment rules:

* leading (untiled) axis — exact per-side strips at arbitrary offsets;
* sublane axis — an 8-aligned window per side (halo rows rewritten from
  the wrap source, the covered interior rows rewritten with themselves);
* lane axis — unsupported (128-alignment can't bracket an H≈4 halo);
  callers fall back to the XLA path.

Values are bit-identical to `fill_halos` periodic slabs by construction
(same wrap indices); `tests/test_fused_fill.py` pins it in interpret
mode, where aliasing also preserves unwritten regions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grids.topology import PERIODIC

#: fill kernels are pure copies — allow a roomy scoped-vmem stack
_FILL_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

#: Override for the in-place fill path: None = auto (TPU only),
#: True/False force it (tests force True on CPU, in interpret mode).
FORCE_INPLACE = None


def _use_inplace():
    if FORCE_INPLACE is not None:
        return FORCE_INPLACE
    return jax.default_backend() == "tpu"


def fill_halos_fast(data, grid, loc, bcs=None, t=0.0, axes=(0, 1, 2),
                    perm=None):
    """`fill_halos` with periodic axes routed through the in-place Pallas
    strip kernels when the backend and alignment allow; bounded/other
    axes fall through to the XLA slab path. Ordering matches
    `fill_halos` (periodic axes first, in index order), so corner halos
    are bit-identical.

    Routing POLICY matches `fill_halos` (hardware A/B, r5): strips are a
    measured net LOSS for the natural layout (256³ nonhydrostatic 717 vs
    670 M pts/s — launch overhead beats the DUS savings), so they engage
    only for permuted state, under CLIMA_INPLACE_FILL=1, or when tests
    force FORCE_INPLACE."""
    import os
    from ..boundary_conditions.bcs import fill_halos
    if not _use_inplace() or (perm is None and FORCE_INPLACE is None
                              and not os.environ.get("CLIMA_INPLACE_FILL")):
        return fill_halos(data, grid, loc, bcs, t, axes=axes, perm=perm)
    fast = tuple(a for a in axes if supports_inplace_fill(grid, a, perm))
    rest = tuple(a for a in axes if a not in fast)
    interp = jax.default_backend() not in ("tpu",)
    for a in fast:
        data = fill_periodic_axis_inplace(data, grid, a, perm=perm,
                                          interpret=interp)
    if rest:
        data = fill_halos(data, grid, loc, bcs, t, axes=rest, perm=perm)
    return data


def supports_inplace_fill(grid, axis, perm=None):
    """Static gate for one axis: periodic, undistributed, and the
    physical dim is leading (any offsets) or sublane with workable
    alignment (N % 8 == 0 and H ≤ 8, or H % 8 == 0)."""
    if grid.topology[axis] is not PERIODIC:
        return False
    if getattr(grid, "dist", (None, None, None))[axis] is not None:
        return False
    p = axis if perm is None else perm[axis]
    N, H = grid.shape[axis], grid.halo[axis]
    if H < 1 or H > N:
        return False
    if p == 0:
        return True
    if p == 1:
        # sublane windows need 8-aligned offsets: exact strips when both
        # H and N are multiples of 8, or the mixed H=4 8-window trick
        return N % 8 == 0 and (H % 8 == 0 or H == 4)
    return False  # lane dim: 128-alignment can't bracket a small halo


def _tile_dim(shape, p, window, itemsize, budget=1_200_000):
    # budget is per-WINDOW: Mosaic stacks ~2 input windows + 1 output,
    # double-buffered across grid steps, plus concat temps (~8× total)
    """Pick a tiling dim (≠ p) and tile size so a (window × other dims)
    block fits the VMEM budget. Mosaic constrains Element-window offsets
    by physical dim: leading (untiled) dims take any offset, the sublane
    dim needs 8-aligned tiles, the lane dim 128 — leading dims are
    preferred and lane tiling is never attempted (ADVICE r4). When no
    aligned tiling fits the budget, returns (None, None): one big window
    under the 64 MB compiler limit beats an illegal offset."""
    ndim = len(shape)
    other = [d for d in range(ndim) if d != p]
    block = window * itemsize
    for d in other:
        block *= shape[d]
    if block <= budget:
        return None, None

    def align_of(d):
        if d == ndim - 1:
            return 128
        if d == ndim - 2:
            return 8
        return 1

    need = -(-block // budget)
    for d in sorted(other, key=align_of):
        al = align_of(d)
        if al == 128:
            continue  # lane tiling: 128-granule fills are never worth it
        for t in range(int(shape[d] // need), 0, -1):
            if shape[d] % t:
                continue
            if t % al and t != shape[d]:
                continue  # unaligned window offsets: Mosaic rejects
            if block // shape[d] * t <= budget:
                return d, t
    return None, None


def fill_periodic_axis_inplace(data, grid, axis, perm=None, interpret=None):
    """One periodic axis fill, in place. Requires
    ``supports_inplace_fill(grid, axis, perm)``."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    p = axis if perm is None else perm[axis]
    N, H = grid.shape[axis], grid.halo[axis]
    S = data.shape[p]
    assert S == N + 2 * H
    shape = data.shape
    ndim = data.ndim
    exact = (p == 0) or (H % 8 == 0)
    W = H if exact else 8

    td, tsz = _tile_dim(shape, p, W, data.dtype.itemsize)
    if td is None:
        # no aligned tiling under budget → ONE whole (W × other dims)
        # window; respect the compiler window ceiling or fall back to
        # the XLA slab path instead of failing the Mosaic compile
        block = W * data.dtype.itemsize
        for d in range(ndim):
            if d != p:
                block *= shape[d]
        if block > 48 * 1024 * 1024:
            from ..boundary_conditions.bcs import fill_halos_axis
            from ..utils.location import CENTER
            return fill_halos_axis(data, grid, CENTER, axis, None, None,
                                   perm=perm)
    n_tiles = 1 if td is None else shape[td] // tsz

    def win(offs_fn):
        """BlockSpec with Element window W along p, tiled along td."""
        dims = []
        for d in range(ndim):
            if d == p:
                dims.append(pl.Element(W))
            elif d == td:
                dims.append(pl.Element(tsz))
            else:
                dims.append(pl.Element(shape[d]))

        def index_map(i, j=0):
            out = []
            for d in range(ndim):
                if d == p:
                    out.append(offs_fn(i))
                elif d == td:
                    out.append(j * tsz)
                else:
                    out.append(0)
            return tuple(out)

        return pl.BlockSpec(tuple(dims), index_map)

    if exact:
        # pure strip copies: dst [0:H) ← src [N:N+H); dst [N+H:S) ← src [H:2H)
        dst = win(lambda i: i * (N + H))
        src = win(lambda i: N - i * (N - H))

        def kernel(src_ref, out_ref):
            out_ref[:] = src_ref[:]

        return pl.pallas_call(
            kernel, grid=(2, n_tiles) if td is not None else (2,),
            in_specs=[src], out_specs=dst,
            out_shape=jax.ShapeDtypeStruct(shape, data.dtype),
            input_output_aliases={0: 0}, interpret=interpret,
            compiler_params=None if interpret else _FILL_PARAMS)(data)

    # mixed 8-windows (H == 4, N % 8 == 0):
    #   side 0: window [0:8)   = concat(src[N:N+4], self[4:8))
    #   side 1: window [N:N+8) = concat(self[N:N+4], src[4:8))
    assert H == 4 and W == 8
    dst = win(lambda i: i * N)
    src = win(lambda i: (1 - i) * N)

    def kernel(self_ref, src_ref, out_ref):
        i = pl.program_id(0)
        sl_lo = [slice(None)] * ndim
        sl_hi = [slice(None)] * ndim
        sl_lo[p] = slice(0, H)
        sl_hi[p] = slice(H, W)
        side0 = jnp.concatenate([src_ref[tuple(sl_lo)],
                                 self_ref[tuple(sl_hi)]], axis=p)
        side1 = jnp.concatenate([self_ref[tuple(sl_lo)],
                                 src_ref[tuple(sl_hi)]], axis=p)
        out_ref[:] = jnp.where(i == 0, side0, side1)

    return pl.pallas_call(
        kernel, grid=(2, n_tiles) if td is not None else (2,),
        in_specs=[dst, src], out_specs=dst,
        out_shape=jax.ShapeDtypeStruct(shape, data.dtype),
        input_output_aliases={0: 0}, interpret=interpret,
        compiler_params=None if interpret else _FILL_PARAMS)(data, data)
