"""Fused advective-tendency Pallas kernel.

The hot path of the nonhydrostatic/hydrostatic models is the advective
flux divergence of every prognostic field (WENO5: hundreds of XLA HLOs).
XLA materializes the intermediate reconstructions to HBM — measured
~70 GB of traffic per AB2 step at 256³, i.e. ~500 full-array passes —
so the step is bandwidth-bound far above its ~30-pass minimum.

This kernel evaluates **all** advective tendencies in one pass over
(x, y) tiles with full-z windows: each tile reads the (u, v, w, tracers)
halo windows into VMEM once, evaluates the same whole-array stencil
expressions used by the reference jnp path (bit-identical results — the
flux functions are reused verbatim on the VMEM blocks), and writes the
interior tendencies. Traffic drops to ~(inputs × halo-amplification +
outputs) ≈ 2 passes per array.

Requirements: regular grid spacing (metrics are compile-time scalars) and
y-halo chosen so the y-window is a multiple of 8 (TPU sublane tiling);
the z window uses the full-array-dimension exemption from the lane-128
rule. Falls back to interpret mode off-TPU (used by the CPU test suite).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC


@dataclasses.dataclass(frozen=True)
class ConstMetricGrid:
    """Minimal metric protocol with compile-time-constant spacings.

    ``reduced_masks`` optionally carries near-boundary order-reduction
    masks keyed by (axis, required_halo) — only legal for axes whose
    kernel window spans the full array dimension (z in the 3D kernel,
    y in the 2D kernel), since the masks are absolute positions."""

    ddx: float
    ddy: float
    ddz: float
    reduced_masks: object = None

    def spacing(self, axis, loc):
        return (self.ddx, self.ddy, self.ddz)[axis]

    def dx(self, loc):
        return self.ddx

    def dy(self, loc):
        return self.ddy

    def dz(self, loc):
        return self.ddz

    def Ax(self, loc):
        return self.ddy * self.ddz

    def Ay(self, loc):
        return self.ddx * self.ddz

    def Az(self, loc):
        return self.ddx * self.ddy

    def V(self, loc):
        return self.ddx * self.ddy * self.ddz


#: widest 2D (squeezed-z) full-row lane window the Mosaic compiler
#: handles; beyond it the 2D kernel tiles y in 128-multiple windows
#: (tests lower this to exercise the tiled layout on small grids)
FULL_ROW_MAX_NY = 1100


class _fast_div:
    """Trace-time context: enables WENO5's approx-reciprocal division
    while a Pallas kernel body is being traced."""

    def __enter__(self):
        from ..advection import schemes as S
        self._old = S.PALLAS_FAST_DIV
        S.PALLAS_FAST_DIV = True

    def __exit__(self, *exc):
        from ..advection import schemes as S
        S.PALLAS_FAST_DIV = self._old
        return False


def supports_fused_advection(grid):
    # x/y must not be BOUNDED: near-boundary order-reduction masks are
    # absolute positions, which the tiled x/y windows cannot express
    from ..grids.topology import BOUNDED
    return (not grid.curvilinear and grid.all_regular
            and getattr(grid, "immersed", None) is None
            and grid.topology[0] is not BOUNDED
            and grid.topology[1] is not BOUNDED
            and grid.Hy >= 1 and grid.Nz >= 1)


def _tile_sizes(nx, ny, hx, hy, zt, itemsize=4, budget_bytes=520_000):
    """Pick (TX, TY) dividing (nx, ny) with (TY+2hy) % 8 == 0 (or full),
    keeping the padded VMEM window under `budget_bytes` (the kernel's
    scratch stack is ~25-30 windows; VMEM is 16 MB). ty is capped at 16 —
    wider windows crash the Mosaic compiler at 256³ (remote_compile HTTP
    500) and (8,16) measured fastest of the configs that compile."""
    def divisors(n):
        return [d for d in range(1, n + 1) if n % d == 0]

    def pad(v, m):
        return -(-v // m) * m

    z_pad = pad(zt, 128)
    best = None
    for ty in divisors(ny):
        ty_w = ty + 2 * hy
        if (ty_w % 8 != 0 and ty != ny) or ty > 16:
            continue
        for tx in divisors(nx):
            tx_w = tx + 2 * hx
            win = tx_w * pad(ty_w, 8) * z_pad * itemsize
            if win > budget_bytes:
                continue
            score = tx * ty  # larger tiles → less halo re-read
            if best is None or score > best[0] or (score == best[0]
                                                   and ty > best[2]):
                best = (score, tx, ty)
    if best is None:
        return 1, ny  # last resort (tiny grids)
    return best[1], best[2]


def pallas_fuse(fn, grid, n_out, interpret=None):
    """Tile ANY whole-array stencil function into one fused Pallas pass.

    ``fn(*blocks) -> tuple of n_out blocks`` evaluates the stencil math on
    (tx+2hx, ty+2hy, zt) VMEM windows (reusing the ordinary jnp stencil
    code); the wrapper returns a function over with-halo arrays producing
    with-halo outputs whose x/y halos are zero-padded. Regular grids only
    (metrics must be compile-time constants inside ``fn``)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    nx, ny, nz = grid.shape
    hx, hy, hz = grid.halo
    zt = nz + 2 * hz

    if nz == 1 and hz == 0:
        # 2D fields: squeeze z so y is the lane dimension (a trailing
        # size-1 lane dim would waste 127/128 of the VPU). Two layouts:
        #   * small grids (ny_tot ≤ 1100): tile x only, y-window = full
        #     array dim (the lane-128 rule's exemption);
        #   * large grids: tile y too. Mosaic requires lane-dim blocks
        #     divisible by 128 (or full), so the y-halo must be a
        #     64-multiple (window = ty + 2·64) — the model inflates its
        #     y-halo accordingly. The y-tiled layout needs relative (not
        #     absolute) y positions in-kernel, so bounded-y
        #     order-reduction masks rule it out — the model gates those
        #     grids to the XLA path.
        ny_tot = ny + 2 * hy
        full_row = ny_tot <= FULL_ROW_MAX_NY
        from ..grids.topology import BOUNDED
        y_bounded = (getattr(grid, "topology", (None,) * 3)[1] is BOUNDED)
        if not full_row and (y_bounded
                             or (not interpret and (2 * hy) % 128 != 0)):
            return None

        def wrapped2d(*inputs):
            itemsize = inputs[0].dtype.itemsize
            # y-tiled windows get a much tighter budget: the register
            # allocator's spill space scales with block size × the WENO
            # temp stack (200 KB blocks overflowed the 128 MB scoped-vmem
            # spill budget at 8192²)
            budget = 700_000 if full_row else 50_000
            if full_row:
                ty = ny_tot  # includes halos; no y grid dim
            else:
                ty = None
                for d in range(128, ny + 1, 128):
                    if ny % d == 0 and (8 + 2 * hx) * (d + 2 * hy) * itemsize \
                            <= budget:
                        ty = d
                        # wider lane windows amortize the 64-row halo
                        # re-reads, but Mosaic compile time blows up with
                        # lane width (hang observed at 640); 256 compiles
                        if d >= 256:
                            break
                if ty is None:
                    return None
            ty_w = ty if full_row else ty + 2 * hy
            tx = None
            for d in range(1, nx + 1):
                if nx % d:
                    continue
                # both the input window (tx+2hx) and the output tile (tx)
                # sit in the sublane dim: keep each a multiple of 8
                if d % 8 != 0 or (d + 2 * hx) % 8 != 0:
                    continue
                if (d + 2 * hx) * ty_w * itemsize <= budget:
                    tx = d
            if tx is None:
                return None  # no legal tiling → caller falls back to jnp
            ins2 = [x[:, :, 0] for x in inputs]

            def kernel(*refs):
                in_refs = refs[:len(inputs)]
                out_refs = refs[len(inputs):]
                blocks = [r[:][:, :, None] for r in in_refs]
                ysl = slice(None) if full_row else slice(hy, hy + ty)
                with _fast_div():
                    outs = fn(*blocks)
                for o_ref, o in zip(out_refs, outs):
                    o_ref[:] = o[hx:hx + tx, ysl, 0]

            if full_row:
                win = pl.BlockSpec((pl.Element(tx + 2 * hx), pl.Element(ny_tot)),
                                   lambda i: (i * tx, 0))
                out_spec = pl.BlockSpec((tx, ny_tot), lambda i: (i, 0))
                out_shape = jax.ShapeDtypeStruct((nx, ny_tot), inputs[0].dtype)
                pgrid = (nx // tx,)
                pad = ((hx, hx), (0, 0))
            else:
                # grid order (j, i): x innermost, so the pipeline stages
                # (tx+2hx)-row strips, not full-x columns (which blew the
                # 16 MB scoped-vmem limit at 8192²)
                win = pl.BlockSpec((pl.Element(tx + 2 * hx),
                                    pl.Element(ty + 2 * hy)),
                                   lambda j, i: (i * tx, j * ty))
                out_spec = pl.BlockSpec((tx, ty), lambda j, i: (i, j))
                out_shape = jax.ShapeDtypeStruct((nx, ny), inputs[0].dtype)
                pgrid = (ny // ty, nx // tx)
                pad = ((hx, hx), (hy, hy))
            outs = pl.pallas_call(
                kernel,
                grid=pgrid,
                in_specs=[win] * len(inputs),
                out_specs=[out_spec] * n_out,
                out_shape=[out_shape] * n_out,
                interpret=interpret,
            )(*ins2)
            return tuple(jnp.pad(o, pad)[:, :, None] for o in outs)

        return wrapped2d

    def wrapped(*inputs):
        tx, ty = _tile_sizes(nx, ny, hx, hy, zt,
                             itemsize=inputs[0].dtype.itemsize)

        def kernel(*refs):
            in_refs = refs[:len(inputs)]
            out_refs = refs[len(inputs):]
            blocks = [r[:] for r in in_refs]
            sl = (slice(hx, hx + tx) if blocks[0].shape[0] > tx else slice(None),
                  slice(hy, hy + ty) if blocks[0].shape[1] > ty else slice(None),
                  slice(None))
            with _fast_div():
                outs = fn(*blocks)
            for o_ref, o in zip(out_refs, outs):
                o_ref[:] = o[sl]

        win = pl.BlockSpec(
            (pl.Element(tx + 2 * hx), pl.Element(ty + 2 * hy), pl.Element(zt)),
            lambda i, j: (i * tx, j * ty, 0))
        out_spec = pl.BlockSpec((tx, ty, zt), lambda i, j: (i, j, 0))
        out_shape = jax.ShapeDtypeStruct((nx, ny, zt), inputs[0].dtype)
        outs = pl.pallas_call(
            kernel,
            grid=(nx // tx, ny // ty),
            in_specs=[win] * len(inputs),
            out_specs=[out_spec] * n_out,
            out_shape=[out_shape] * n_out,
            interpret=interpret,
        )(*inputs)
        pad = ((hx, hx), (hy, hy), (0, 0))
        return tuple(jnp.pad(o, pad) for o in outs)

    return wrapped


def fused_advective_tendencies(grid, scheme, tracer_scheme, u, v, w, tracers,
                               interpret=None):
    """−div(advective fluxes) for u, v, w and every tracer, in one fused
    Pallas pass. Returns a dict of with-halo arrays (x/y halo regions are
    zero; z range mirrors the jnp path's garbage-in-halo convention)."""
    from ..advection.fluxes import div_Uc, div_vu, div_vv, div_vw

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    nx, ny, nz = grid.shape
    hx, hy, hz = grid.halo
    zt = nz + 2 * hz
    ax = grid._axes
    # near-boundary order reduction along z (full-window axis): absolute
    # masks are legal there; supports_fused_advection() rejects bounded x/y
    from ..advection.schemes import reduced_order_masks
    rmasks = {}
    for sch in (scheme, tracer_scheme):
        m = reduced_order_masks(grid, 2, sch)
        if m is not None:
            rmasks[(2, sch.required_halo)] = m
    cg = ConstMetricGrid(float(ax[0].extent / max(nx, 1)) if nx > 1 else 1.0,
                         float(ax[1].extent / max(ny, 1)) if ny > 1 else 1.0,
                         float(ax[2].extent / max(nz, 1)) if nz > 1 else 1.0,
                         reduced_masks=rmasks or None)
    tx, ty = _tile_sizes(nx, ny, hx, hy, zt, itemsize=u.dtype.itemsize)
    names = list(tracers)
    n_out = 3 + len(names)

    def kernel(u_ref, v_ref, w_ref, *refs):
        c_refs = refs[:len(names)]
        out_refs = refs[len(names):]
        ub, vb, wb = u_ref[:], v_ref[:], w_ref[:]
        sl = (slice(hx, hx + tx) if ub.shape[0] > tx else slice(None),
              slice(hy, hy + ty) if ub.shape[1] > ty else slice(None),
              slice(None))
        with _fast_div():
            out_refs[0][:] = -div_vu(cg, scheme, ub, vb, wb)[sl]
            out_refs[1][:] = -div_vv(cg, scheme, ub, vb, wb)[sl]
            out_refs[2][:] = -div_vw(cg, scheme, ub, vb, wb)[sl]
            for k, cref in enumerate(c_refs):
                out_refs[3 + k][:] = -div_Uc(cg, tracer_scheme, ub, vb, wb,
                                             cref[:])[sl]

    win = pl.BlockSpec(
        (pl.Element(tx + 2 * hx), pl.Element(ty + 2 * hy), pl.Element(zt)),
        lambda i, j: (i * tx, j * ty, 0))
    out_spec = pl.BlockSpec((tx, ty, zt), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((nx, ny, zt), u.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(nx // tx, ny // ty),
        in_specs=[win] * (3 + len(names)),
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        interpret=interpret,
    )(u, v, w, *[tracers[n] for n in names])

    pad = ((hx, hx), (hy, hy), (0, 0))
    result = dict(u=jnp.pad(outs[0], pad), v=jnp.pad(outs[1], pad),
                  w=jnp.pad(outs[2], pad))
    for k, n in enumerate(names):
        result[n] = jnp.pad(outs[3 + k], pad)
    return result
