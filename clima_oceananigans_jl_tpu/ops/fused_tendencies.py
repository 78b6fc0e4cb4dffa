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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC

#: scoped-vmem ceiling for the fused kernels (default is 16 MB; v5e has
#: 128 MB physical VMEM). The WENO kernels keep ~30 window-sized temps
#: live, so realistic windows need ~20-60 MB of compiler "stack".
_VMEM_LIMIT = 112 * 1024 * 1024  # of 128M physical; bf16-smoothness AB2
                                 # kernel stack measures 102M at (16,64)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


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
    # absolute positions, which the tiled x/y windows cannot express.
    # CLIMA_NO_FUSED=1 (env) force-disables every fused Pallas path —
    # the bench supervisor's last-resort degradation level.
    # x/y must be regular (metrics become compile-time scalars); z may be
    # STRETCHED — per-level Δz and stretched-WENO coefficient tables ride
    # the metric-pack input (ops/kernel_grid.py), matching the reference's
    # full-speed stretched-grid WENO (weno_fifth_order.jl:33-60).
    import os
    if os.environ.get("CLIMA_NO_FUSED"):
        return False
    from ..grids.topology import BOUNDED
    return (not grid.curvilinear and grid.hregular
            and getattr(grid, "immersed", None) is None
            and grid.topology[0] is not BOUNDED
            and grid.topology[1] is not BOUNDED
            and grid.Hy >= 1 and grid.Nz >= 1)


def _tile_sizes(nx, ny, hx, hy, zt, itemsize=4, budget_bytes=3_000_000):
    """Pick (TX, TY) dividing (nx, ny) with (TY+2hy) % 8 == 0 (or full),
    keeping the padded VMEM window under `budget_bytes`. The WENO kernel's
    register-spill stack holds ~30 window-sized temps at 4 prognostic
    fields, so the default 3.0 MB budget sits just under the 100 MB
    scoped-vmem ceiling (`_VMEM_LIMIT`); callers with more fields scale
    the budget down. At 256³ fp32 this picks (8,128) — measured 482 vs
    452 M pts/s for the old 16 MB-limit pick (8,16)."""
    def divisors(n):
        return [d for d in range(1, n + 1) if n % d == 0]

    def pad(v, m):
        return -(-v // m) * m

    z_pad = pad(zt, 128)
    cands = []
    for ty in divisors(ny):
        ty_w = ty + 2 * hy
        if ty_w % 8 != 0 and ty != ny:
            continue
        for tx in divisors(nx):
            tx_w = tx + 2 * hx
            win = tx_w * pad(ty_w, 8) * z_pad * itemsize
            if win > budget_bytes:
                continue
            # the kernels are VPU-bound: score by useful fraction of the
            # padded window (halo amplification is wasted vector work)
            eff = (tx * ty) / (tx_w * pad(ty_w, 8))
            cands.append((eff, ty, tx * ty, tx))
    if not cands:
        return 1, ny  # last resort (tiny grids)
    # among near-best efficiencies prefer the larger y tile — measured
    # (16,64) 10.7 ms vs (32,32) 11.2 ms vs (8,128) 12.0 ms for the 256³
    # z_slim WENO tendency kernel on v5e despite similar eff scores
    emax = max(c[0] for c in cands)
    best = max((c for c in cands if c[0] >= 0.95 * emax),
               key=lambda c: (c[1], c[2]))
    return best[3], best[1]


def z_halo_free_ok(grid, w_bcs=None):
    """True when the 3D fused kernels may carry z-HALO-FREE blocks: the
    z (lane) window is exactly Nz instead of Nz+2Hz, so at 256³ the lane
    dim is 2 full vregs (256) instead of 262 padded to 384 — every VPU op
    in the kernel drops ~33% of its work.

    Correctness: in-kernel shifts are rolls, so z reads wrap in-block.
    - PERIODIC z: the wrap IS the periodic condition — bit-exact.
    - BOUNDED z with impenetrable w (open/value BCs with zero value): the
      advective flux through both boundary faces carries vel = w = 0
      exactly (the halo fill imposes the wall faces, bcs.py
      ``_bounded_slab``), so wrapped reconstruction garbage at the
      boundary faces is annihilated; near-boundary reduced-order
      fallbacks read only in-block cells elsewhere. The single exception
      is G_w/w′ at the BOTTOM boundary face (k=0), which is left
      unspecified — it is dynamically irrelevant (the projection imposes
      the wall value before the divergence, nonhydrostatic.py
      ``project_velocities``, and the halo fill re-imposes it after).
      Multi-step solutions are bit-identical (test_fused_tendencies.py).

    ``CLIMA_NO_ZSLIM=1`` (env) force-disables the layout — the bench
    supervisor's degradation ladder uses it if the slim kernel ever
    fails to compile on real TPU hardware.
    """
    import os
    if os.environ.get("CLIMA_NO_ZSLIM"):
        return False
    from ..grids.topology import PERIODIC, BOUNDED
    nz = grid.shape[2]
    if nz <= 1 or grid.halo[2] == 0:
        return False
    if not grid.z_regular:
        # stretched z: metric-pack rows and WENO tables are built for the
        # full (nz+2hz)-lane window; slim blocks would misalign them
        return False
    topo = grid.topology[2]
    if topo is PERIODIC:
        return True
    if topo is not BOUNDED or w_bcs is None:
        return False
    for bc in (w_bcs.bottom, w_bcs.top):
        if bc is None or bc.kind not in ("open", "value"):
            return False
        v = bc.value
        if not (v is None or (isinstance(v, (int, float)) and v == 0.0)):
            return False
    return True


def _shift_rmasks(rmasks, hz):
    """Reduced-order mask bounds are absolute with-halo z indices; in a
    z-halo-free block the z coordinate is (absolute − hz)."""
    if not rmasks or hz == 0:
        return rmasks
    return {k: tuple((lo - hz, hi - hz) for lo, hi in triple)
            for k, triple in rmasks.items()}


#: how z-slim kernels obtain the nz-lane blocks. True: the input window
#: itself is (…, nz) at Element offset hz — the DMA does the realignment
#: for free (window size nz must then be a 128-multiple or Mosaic may
#: reject the unaligned lane offset). False: full (…, nz+2hz) windows,
#: sliced to nz lanes in-kernel (always compiles; costs one lane-shift
#: relayout per input block). CLIMA_ZSLIM_DMA=1 enables the DMA variant
#: (A/B'd at bench time on real TPU).
Z_SLIM_DMA = bool(os.environ.get("CLIMA_ZSLIM_DMA"))


def _zslim_in(block, hz, nz):
    """Kernel-side z-halo drop for the in-kernel-slice variant."""
    if block.shape[-1] == nz:
        return block
    return block[..., hz:hz + nz]


def pallas_fuse(fn, grid, n_out, interpret=None, z_slim=False):
    """Tile ANY whole-array stencil function into one fused Pallas pass.

    ``fn(*blocks) -> tuple of n_out blocks`` evaluates the stencil math on
    (tx+2hx, ty+2hy, zt) VMEM windows — (tx+2hx, row) 2D windows on
    squeezed-z grids, where ``fn`` must be ndim-agnostic (axes 0/1 only) —
    reusing the ordinary jnp stencil code; the wrapper returns a function
    over with-halo arrays producing with-halo outputs whose x/y halos are
    zero-padded. Regular grids only (metrics must be compile-time
    constants inside ``fn``).

    ``z_slim=True`` (caller must establish ``z_halo_free_ok``, and ``fn``
    must be wrap-safe in z — its z reads at the walls either annihilated
    by zero wall-normal velocity or overwritten before the next read):
    blocks carry exactly nz lanes instead of nz+2hz, outputs are z-halo
    padded with zeros."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    nx, ny, nz = grid.shape
    hx, hy, hz = grid.halo
    zt = nz + 2 * hz
    if z_slim and hz == 0:
        z_slim = False

    if nz == 1 and hz == 0:
        # 2D fields: squeeze z so y is the lane dimension (a trailing
        # size-1 lane dim would waste 127/128 of the VPU). The kernel
        # window spans the FULL y row (the lane-128 rule's full-dim
        # exemption) and tiles x in 8-multiple sublane windows. Rows
        # wider than FULL_ROW_MAX_NY break the Mosaic compiler (hangs /
        # register-spill scoped-vmem OOM — y-tiled Element lane windows
        # fared even worse, 21 MB spills at 24 KB blocks), so large
        # grids are CHUNKED along y at the XLA level: overlapping
        # (nx_tot, yc+2hy) slices each run the same proven full-row
        # kernel (one compilation — identical shapes), and the interiors
        # concatenate back. Overlap overhead is 2hy/yc ≈ 0.6%.
        ny_tot = ny + 2 * hy
        full_row = ny_tot <= FULL_ROW_MAX_NY
        from ..grids.topology import BOUNDED
        y_bounded = (getattr(grid, "topology", (None,) * 3)[1] is BOUNDED)
        yc = None
        if not full_row:
            if y_bounded:
                # chunk-relative y positions can't express the absolute
                # bounded-y order-reduction masks
                return None
            for cand in (1024, 512, 256, 128, 64, 32):
                if ny % cand == 0 and cand + 2 * hy <= FULL_ROW_MAX_NY:
                    yc = cand
                    break
            if yc is None:
                return None

        def wrapped2d(*inputs):
            itemsize = inputs[0].dtype.itemsize
            budget = 700_000
            row_w = ny_tot if full_row else yc + 2 * hy
            tx = None
            for d in range(1, nx + 1):
                if nx % d:
                    continue
                # both the input window (tx+2hx) and the output tile (tx)
                # sit in the sublane dim: keep each a multiple of 8
                if d % 8 != 0 or (d + 2 * hx) % 8 != 0:
                    continue
                if (d + 2 * hx) * row_w * itemsize <= budget:
                    tx = d
            if tx is None:
                return None  # no legal tiling → caller falls back to jnp
            ins2 = [x[:, :, 0] for x in inputs]

            def kernel(*refs):
                in_refs = refs[:len(inputs)]
                out_refs = refs[len(inputs):]
                # blocks stay 2D (x, y): re-adding a trailing size-1 z dim
                # would make it the LANE dim, and Mosaic relayouts every
                # (x, y, 1) buffer into 128×-padded lane tiles — a measured
                # 19.7 MB scoped-vmem request for a trivial 73 KB-window
                # kernel. The stencil core is ndim-agnostic (axes 0/1).
                blocks = [r[:] for r in in_refs]
                with _fast_div():
                    outs = fn(*blocks)
                for o_ref, o in zip(out_refs, outs):
                    o_ref[:] = o[hx:hx + tx, :]

            win = pl.BlockSpec((pl.Element(tx + 2 * hx), pl.Element(row_w)),
                               lambda i: (i * tx, 0))
            out_spec = pl.BlockSpec((tx, row_w), lambda i: (i, 0))
            out_shape = jax.ShapeDtypeStruct((nx, row_w), inputs[0].dtype)
            call = pl.pallas_call(
                kernel,
                grid=(nx // tx,),
                in_specs=[win] * len(inputs),
                out_specs=[out_spec] * n_out,
                out_shape=[out_shape] * n_out,
                interpret=interpret,
                compiler_params=None if interpret else _COMPILER_PARAMS,
            )
            if full_row:
                outs = call(*ins2)
                return tuple(jnp.pad(o, ((hx, hx), (0, 0)))[:, :, None]
                             for o in outs)
            # chunked: same compiled kernel over overlapping y slices
            pieces = [[] for _ in range(n_out)]
            for c in range(ny // yc):
                sub = [a[:, c * yc: c * yc + yc + 2 * hy] for a in ins2]
                outs = call(*sub)
                for k, o in enumerate(outs):
                    pieces[k].append(o[:, hy: hy + yc])
            return tuple(jnp.pad(jnp.concatenate(ps, axis=1),
                                 ((hx, hx), (hy, hy)))[:, :, None]
                         for ps in pieces)

        return wrapped2d

    zk = nz if z_slim else zt  # lane extent of every value in the kernel
    z_dma = z_slim and Z_SLIM_DMA and nz % 128 == 0
    zw = nz if z_dma else zt  # lane extent of the input windows
    z_off = hz if z_dma else 0

    def wrapped(*inputs):
        # temp count scales with the number of fields evaluated in-kernel
        nf = max(4, len(inputs), n_out)
        tx, ty = _tile_sizes(nx, ny, hx, hy, zk,
                             itemsize=inputs[0].dtype.itemsize,
                             budget_bytes=int(12_000_000 / nf))

        def kernel(*refs):
            in_refs = refs[:len(inputs)]
            out_refs = refs[len(inputs):]
            blocks = [_zslim_in(r[:], hz, zk) for r in in_refs]
            sl = (slice(hx, hx + tx) if blocks[0].shape[0] > tx else slice(None),
                  slice(hy, hy + ty) if blocks[0].shape[1] > ty else slice(None),
                  slice(None))
            with _fast_div():
                outs = fn(*blocks)
            for o_ref, o in zip(out_refs, outs):
                o_ref[:] = o[sl]

        win = pl.BlockSpec(
            (pl.Element(tx + 2 * hx), pl.Element(ty + 2 * hy), pl.Element(zw)),
            lambda i, j: (i * tx, j * ty, z_off))
        out_spec = pl.BlockSpec((tx, ty, zk), lambda i, j: (i, j, 0))
        out_shape = jax.ShapeDtypeStruct((nx, ny, zk), inputs[0].dtype)
        outs = pl.pallas_call(
            kernel,
            grid=(nx // tx, ny // ty),
            in_specs=[win] * len(inputs),
            out_specs=[out_spec] * n_out,
            out_shape=[out_shape] * n_out,
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(*inputs)
        pad = ((hx, hx), (hy, hy), (hz, hz) if z_slim else (0, 0))
        return tuple(jnp.pad(o, pad) for o in outs)

    return wrapped


def fused_advective_tendencies(grid, scheme, tracer_scheme, u, v, w, tracers,
                               interpret=None, z_slim=False):
    """−div(advective fluxes) for u, v, w and every tracer, in one fused
    Pallas pass. Returns a dict of with-halo arrays (x/y halo regions are
    zero; z range mirrors the jnp path's garbage-in-halo convention —
    zeros instead under ``z_slim``, which the caller enables only when
    ``z_halo_free_ok`` holds)."""
    from ..advection.fluxes import div_Uc, div_vu, div_vv, div_vw

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    nx, ny, nz = grid.shape
    hx, hy, hz = grid.halo
    zt = nz + 2 * hz
    if z_slim and hz == 0:
        z_slim = False
    zk = nz if z_slim else zt
    z_dma = z_slim and Z_SLIM_DMA and nz % 128 == 0
    zw = nz if z_dma else zt
    z_off = hz if z_dma else 0
    # near-boundary order reduction along z (full-window axis): absolute
    # masks are legal there; supports_fused_advection() rejects bounded x/y
    from ..advection.schemes import WENO5, reduced_order_masks
    rmasks = {}
    for sch in (scheme, tracer_scheme):
        m = reduced_order_masks(grid, 2, sch)
        if m is not None:
            rmasks[(2, sch.required_halo)] = m
    if z_slim:
        rmasks = _shift_rmasks(rmasks, hz)
    # metric grid: compile-time scalars for regular axes; stretched-z Δz
    # rows (and WENO coordinate rows for the in-kernel stretched tables)
    # ride a metric-pack input (ops/kernel_grid.py). All-regular grids get
    # an empty pack — scalar entries only, no extra input.
    from .kernel_grid import build_metric_pack
    any_weno = any(isinstance(s, WENO5) for s in (scheme, tracer_scheme))
    pack = build_metric_pack(grid, need_ztables=any_weno
                             and not grid.z_regular)
    has_pack = pack.pack is not None
    names = list(tracers)
    n_out = 3 + len(names)
    # size tiles by the ACTUAL DMA window lane count (zw, not the slim
    # in-kernel zk): under z_slim the inputs still carry nz+2hz lanes
    # padded to a 128-multiple, and budgeting with zk undercounts VMEM by
    # pad(zt)/pad(nz) (1.5x at 256^3) — a scoped-vmem OOM that surfaces
    # as a silent multi-minute compile hang on real TPUs
    tx, ty = _tile_sizes(nx, ny, hx, hy, zw, itemsize=u.dtype.itemsize,
                         budget_bytes=int(13_000_000 / max(4, n_out)))

    def kernel(*refs):
        if has_pack:
            pack_ref, refs = refs[0], refs[1:]
        u_ref, v_ref, w_ref = refs[:3]
        c_refs = refs[3:3 + len(names)]
        out_refs = refs[3 + len(names):]
        cg = pack.kernel_grid(pack_ref[:] if has_pack else None,
                              reduced_masks=rmasks or None)
        ub = _zslim_in(u_ref[:], hz, zk)
        vb = _zslim_in(v_ref[:], hz, zk)
        wb = _zslim_in(w_ref[:], hz, zk)
        sl = (slice(hx, hx + tx) if ub.shape[0] > tx else slice(None),
              slice(hy, hy + ty) if ub.shape[1] > ty else slice(None),
              slice(None))
        with _fast_div():
            out_refs[0][:] = -div_vu(cg, scheme, ub, vb, wb)[sl]
            out_refs[1][:] = -div_vv(cg, scheme, ub, vb, wb)[sl]
            out_refs[2][:] = -div_vw(cg, scheme, ub, vb, wb)[sl]
            for k, cref in enumerate(c_refs):
                out_refs[3 + k][:] = -div_Uc(cg, tracer_scheme, ub, vb, wb,
                                             _zslim_in(cref[:], hz, zk))[sl]

    win = pl.BlockSpec(
        (pl.Element(tx + 2 * hx), pl.Element(ty + 2 * hy), pl.Element(zw)),
        lambda i, j: (i * tx, j * ty, z_off))
    pack_win = pl.BlockSpec(
        (pl.Element(pack.n_rows), pl.Element(ty + 2 * hy), pl.Element(zt)),
        lambda i, j: (0, j * ty, 0))
    out_spec = pl.BlockSpec((tx, ty, zk), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((nx, ny, zk), u.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(nx // tx, ny // ty),
        in_specs=(([pack_win] if has_pack else [])
                  + [win] * (3 + len(names))),
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*(([pack.pack] if has_pack else [])
        + [u, v, w] + [tracers[n] for n in names]))

    pad = ((hx, hx), (hy, hy), (hz, hz) if z_slim else (0, 0))
    result = dict(u=jnp.pad(outs[0], pad), v=jnp.pad(outs[1], pad),
                  w=jnp.pad(outs[2], pad))
    for k, n in enumerate(names):
        result[n] = jnp.pad(outs[3 + k], pad)
    return result
