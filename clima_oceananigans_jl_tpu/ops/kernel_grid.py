"""Kernel-side metric grids: curvilinear / stretched spacings inside
fused Pallas kernels.

The fused tendency kernels (ops/fused_tendencies.py, ops/fused_step.py)
reuse the ordinary jnp stencil/flux functions on VMEM blocks by handing
them a grid-like object implementing the metric protocol
(``dx/dy/dz/Ax/Ay/Az/V/spacing`` of a location triple). The original
``ConstMetricGrid`` only expresses compile-time-constant spacings — i.e.
fully regular Cartesian boxes. This module generalizes that to every
grid whose metrics depend on (y, z) only:

* latitude-longitude shells with regular longitude spacing — Δx = R cosφ Δλ
  and Az = R²Δλ(sinφ⁺−sinφ⁻) vary with latitude (y) alone
  (reference /root/reference/src/Grids/latitude_longitude_grid.jl:5-44);
* arbitrarily stretched latitude (φ) and depth (z) axes — per-row /
  per-level spacing arrays
  (reference rectilinear_grid.jl stretched axes, weno_fifth_order.jl:33-60
  stretched reconstruction tables);
* y-dependent Coriolis parameters (f-plane / β-plane / 2Ω sinφ).

Mechanism: every y/z-dependent metric is packed host-side into ONE
stacked ``(n_rows, ny_tot, zt)`` array. The kernel windows it with the
same y-window as the field blocks (and the full z window), unpacks rows
into ``(ty+2hy, zt)`` 2D blocks, and those broadcast against the 3D
``(tx+2hx, ty+2hy, zt)`` field blocks along the leading (x) dim — a
layout-preserving broadcast on TPU (last-two-dims (sublane, lane) tiling
is unchanged). Metrics that are compile-time constants stay python
floats and cost nothing. Because the pack's y-window index depends only
on the y program id, ordering the pallas grid y-outer/x-inner means the
pack DMA is skipped across the whole inner x sweep.

Bit-exactness: pack rows are slices of the very arrays the jnp path
multiplies by (x-constant by construction for regular-λ grids — see
``LatitudeLongitudeGrid._precompute_metrics`` canonicalization), so the
fused kernels remain bit-identical to the jnp path, the property the
equivalence tests enforce.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..grids.topology import FLAT
from ..utils.location import C, F

#: metric keys that may appear in a pack, in canonical order
_LOC2 = ((C, C), (C, F), (F, C), (F, F))


@dataclasses.dataclass(frozen=True)
class _DuckAxis:
    """Minimal axis for ``weno5_tables`` duck-typing inside kernels:
    static topology/regularity plus (for stretched axes) the in-kernel
    coordinate rows the table algebra rebuilds its coefficients from."""

    topo: object
    regular: bool
    cf: object = None
    cc: object = None


class KernelGrid:
    """Metric-protocol grid over VMEM blocks / compile-time scalars.

    ``entries``: dict mapping metric keys — ``("dx", lx, ly)``,
    ``("dy", ly)``, ``("dz", lz)``, ``("az", lx, ly)``, ``("ynode", ly)``
    — to python floats or (ty_w, zt) blocks. Composite metrics (Ax, Ay,
    V) are formed in-kernel; the products fuse into the consuming VPU
    expressions. ``reduced_masks``/``iota_offset`` feed the near-boundary
    order-reduction selects (advection/schemes.py); ``iota_offset`` is
    the (x, y, z) element offset of this block's window in the full
    array, so absolute-position masks work inside tiled windows.
    """

    def __init__(self, entries, axes, reduced_masks=None, iota_offset=None,
                 immersed=None):
        self._e = entries
        self._axes = axes
        self.reduced_masks = reduced_masks
        self.iota_offset = iota_offset
        if immersed is not None:
            self.immersed = immersed

    # -- metric protocol -----------------------------------------------------
    def spacing(self, axis, loc):
        return (self.dx, self.dy, self.dz)[axis](loc)

    def dx(self, loc):
        return self._e[("dx", loc[0], loc[1])]

    def dy(self, loc):
        return self._e[("dy", loc[1])]

    def dz(self, loc):
        return self._e[("dz", loc[2])]

    def Az(self, loc):
        return self._e[("az", loc[0], loc[1])]

    def Ax(self, loc):
        return self.dy(loc) * self.dz(loc)

    def Ay(self, loc):
        return self.dx(loc) * self.dz(loc)

    def V(self, loc):
        return self.Az(loc) * self.dz(loc)

    def nodes(self, loc, with_halo=True):
        """Coordinate blocks for position-dependent terms (Coriolis).
        Only the y coordinate is representable (metrics are y/z-only);
        terms reading x or z nodes are gated off the fused path."""
        return (None, self._e.get(("ynode", loc[1])), None)


@dataclasses.dataclass
class MetricPack:
    """Host-side result of ``build_metric_pack``: the stacked pack array
    plus everything needed to rebuild a ``KernelGrid`` inside the kernel.

    ``layout``: "yz" — rows are (ny_tot, zt), for kernels on natural
    (x, y, z) blocks; "zy" — rows are (zt, ny_tot), for the transposed
    shallow-z kernels whose blocks are (x, z, y) (y in the lane dim)."""

    pack: object          # (n_rows, ny_tot, zt) array (or None if empty)
    keys: tuple           # pack row keys, in row order
    scalars: dict         # key -> python float (compile-time constants)
    axes: tuple           # (_DuckAxis, _DuckAxis, _DuckAxis) topo/regular
    z_table_keys: tuple   # subset of keys holding z cf/cc rows (1D use)
    y_table_keys: tuple   # subset of keys holding y cf/cc rows (1D use)
    #: "yz": rows (ny_tot, zt) for natural (x, y, z) blocks; "zy": rows
    #: (zt, ny_tot) for transposed (x, z, y) blocks; "zxy": rows
    #: (zt, 1, ny_tot) for (z, x, y) blocks — the layout matching XLA's
    #: natural physical layout for shallow-z arrays, so the surrounding
    #: jnp.transpose(2,0,1)s are layout-preserving
    layout: str = "yz"

    @property
    def n_rows(self):
        return len(self.keys)

    def kernel_grid(self, pack_block, reduced_masks=None, iota_offset=None,
                    immersed=None):
        """Build the in-kernel grid from the windowed pack block
        ((n_rows, ty_w, zt) for "yz", (n_rows, zt, ty_w) for "zy";
        pass None when the pack is empty)."""
        entries = dict(self.scalars)
        for i, k in enumerate(self.keys):
            entries[k] = pack_block[i]
        axes = list(self.axes)
        if ("zcf",) in entries:
            if self.layout in ("zy", "zxy"):
                # transposed layouts: keep the full 2D/3D rows — the
                # table algebra rolls axis 0 (z) and the coefficient
                # arrays broadcast against the blocks' trailing dims with
                # no lane relayout
                zcf, zcc = entries[("zcf",)], entries[("zcc",)]
            else:
                # natural layout: 1D (zt,) rows (z coords are y-constant)
                zcf, zcc = entries[("zcf",)][0], entries[("zcc",)][0]
            axes[2] = dataclasses.replace(axes[2], cf=zcf, cc=zcc)
        if ("ycf",) in entries:
            if self.layout != "yz":
                raise NotImplementedError(
                    "stretched-y WENO tables in a transposed layout")
            # stretched-y tables: (ty_w,) rows (z-constant → lane 0)
            axes[1] = dataclasses.replace(axes[1],
                                          cf=entries[("ycf",)][:, 0],
                                          cc=entries[("ycc",)][:, 0])
        return KernelGrid(entries, tuple(axes), reduced_masks=reduced_masks,
                          iota_offset=iota_offset, immersed=immersed)


def _scalar(axis):
    """Compile-time constant spacing of a regular axis (exactly the value
    stored in its canonicalized dc/df arrays — _build_axis writes
    full(extent/n) for regular axes)."""
    return float(axis.extent) / axis.n if axis.topo is not FLAT else 1.0


def supports_metric_pack(grid):
    """True when this grid's metrics are expressible as a (y, z) pack:
    x/λ regular (so Δx varies with latitude only), rectilinear or
    latitude-longitude (conformal cubed-sphere faces have fully 2D
    metrics), no partial-cell 3D vertical metrics."""
    if getattr(grid, "_dz_ccc", None) is not None:  # PartialCellBottom
        return False
    parent = getattr(grid, "parent", grid)
    from ..grids.latlon import LatitudeLongitudeGrid
    from ..grids.rectilinear import RectilinearGrid
    if not type(parent) in (RectilinearGrid, LatitudeLongitudeGrid):
        return False
    if not parent._axes[0].regular:
        return False
    return True


def build_metric_pack(grid, need_ynodes=(), need_ztables=False,
                      need_ytables=False, layout="yz"):
    """Build the (y, z)-dependent metric pack for ``grid`` (trace-time;
    metric leaves may be tracers). ``need_ynodes``: location letters (C/F)
    whose y coordinates Coriolis terms read; ``need_ztables``/
    ``need_ytables``: include z/y face+center coordinate rows for
    stretched-axis WENO reconstruction tables. ``layout``: "yz" rows are
    (ny_tot, zt); "zy" rows are (zt, ny_tot) for transposed kernels.
    Requires ``supports_metric_pack(grid)``."""
    from ..grids.latlon import LatitudeLongitudeGrid

    parent = getattr(grid, "parent", grid)
    ax, ay, az_axis = parent._axes
    ny_tot = ay.n + 2 * ay.h if ay.topo is not FLAT else 1
    zt = az_axis.n + 2 * az_axis.h if az_axis.topo is not FLAT else 1
    dtype = parent.dtype

    scalars = {}
    rows = {}  # key -> layout-shaped broadcastable array
    shape = {"yz": (ny_tot, zt), "zy": (zt, ny_tot),
             "zxy": (zt, 1, ny_tot)}[layout]

    def put(key, val, kind):
        """kind: 'y' (1D over y), 'z' (1D over z)."""
        if layout == "yz":
            v = val[:, None] if kind == "y" else val[None, :]
        elif layout == "zy":
            v = val[None, :] if kind == "y" else val[:, None]
        else:  # zxy: rows (zt, 1, ny_tot) broadcast against (zt, tx, ty)
            v = val[None, None, :] if kind == "y" else val[:, None, None]
        rows[key] = jnp.broadcast_to(v, shape)

    is_latlon = isinstance(parent, LatitudeLongitudeGrid)

    # dz (and z coordinates for stretched-z tables)
    if az_axis.topo is FLAT or az_axis.regular:
        scalars[("dz", C)] = scalars[("dz", F)] = _scalar(az_axis)
    else:
        put(("dz", C), az_axis.dc, "z")
        put(("dz", F), az_axis.df, "z")
        if need_ztables:
            put(("zcf",), az_axis.cf, "z")
            put(("zcc",), az_axis.cc, "z")

    # dy / dx / az
    if is_latlon:
        for ly in (C, F):
            # Δy = R Δφ: kept as the exact stored array values even when φ
            # is regular (bit-compat with the jnp path's broadcasts)
            put(("dy", ly), parent._dy_m[ly][0, :, 0], "y")
        xr = parent.Hx  # any x row: regular λ ⇒ metrics x-constant
        for lx, ly in _LOC2:
            put(("dx", lx, ly), parent._dx_m[(lx, ly)][xr, :, 0], "y")
            put(("az", lx, ly), parent._az_m[(lx, ly)][xr, :, 0], "y")
    else:
        sx = _scalar(ax)
        scalars[("dx", C, C)] = scalars[("dx", C, F)] = sx
        scalars[("dx", F, C)] = scalars[("dx", F, F)] = sx
        if ay.topo is FLAT or ay.regular:
            sy = _scalar(ay)
            scalars[("dy", C)] = scalars[("dy", F)] = sy
            for lx, ly in _LOC2:
                scalars[("az", lx, ly)] = sx * sy
        else:
            put(("dy", C), ay.dc, "y")
            put(("dy", F), ay.df, "y")
            for lx, ly in _LOC2:
                put(("az", lx, ly), sx * (ay.dc if ly is C else ay.df), "y")

    for ly in need_ynodes:
        put(("ynode", ly), ay.cc if ly is C else ay.cf, "y")
    if need_ytables and not ay.regular and ay.topo is not FLAT:
        put(("ycf",), ay.cf, "y")
        put(("ycc",), ay.cc, "y")

    keys = tuple(sorted(rows, key=repr))
    pack = (jnp.stack([rows[k].astype(dtype) for k in keys])
            if keys else None)
    z_t = tuple(k for k in keys if k in ((("zcf",)), (("zcc",))))
    y_t = tuple(k for k in keys if k in ((("ycf",)), (("ycc",))))
    axes = tuple(_DuckAxis(a.topo, a.regular) for a in (ax, ay, az_axis))
    return MetricPack(pack, keys, scalars, axes, z_t, y_t, layout=layout)
