"""Whole-loop Pallas kernel for the split-explicit barotropic substeps.

The split-explicit free surface advances (η, U, V) through N (≈30)
barotropic substeps per baroclinic step (reference
split_explicit_free_surface_kernels.jl:15-58). The XLA fori_loop path
(models/free_surface.py substep_eta) streams every 2D field through HBM
once per substep — ~0.6 GB and ~6 ms per 30 substeps of a 1440×608 η on
one v5e — although the whole working set is ~25 MB. Here the ENTIRE
loop runs inside ONE Pallas call with every array VMEM-resident: the
six loop-carried fields live in VMEM across all substeps, halo fills
become lax.concatenate reassemblies (fill_halos_axis(concat=True) — the
same values the XLA slab fills write, required because Mosaic cannot
lower ``.at[].set`` scatters), and the per-substep filter weights are
read from SMEM by the loop index.

Results are bit-identical to the XLA path by construction: the kernel
body reuses the SAME stencil functions (st.dxf/dyf/dxc/dyc) and the
SAME fill formulas on the same with-halo (X, Y) arrays, in the same
order (equivalence test: tests/test_fused_barotropic.py).

Gating (``fused_substep_ok``): single shard, non-FLAT x/y, every halo
fill expressible without captured array constants (periodic wraps and
zero-gradient mirror slabs; Value BCs need a broadcast boundary value —
scalars only — and Gradient BCs build a node-distance constant array,
which a Mosaic kernel cannot capture), and the VMEM working set within
budget. Everything else stays on the XLA loop.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grids.topology import FLAT, PERIODIC
from ..utils.location import C, F
from .fused_tendencies import _COMPILER_PARAMS

#: VMEM budget for the whole working set. The scoped-vmem ceiling is
#: ~100 MB (fused_tendencies _VMEM_LIMIT); the resident set is 5 field
#: inputs + 3 outputs + 6 fori_loop carries + Hfc/Hcf + a few live
#: fill/stencil temps ≈ 24 full buffers — the gate counts 24 against a
#: 92 MB cap, calibrated so the hardware-validated ¼° working set
#: (1446×608 fp32, 24 × 3.70 MB = 88.8 MB) is admitted with margin and
#: anything meaningfully larger falls back to the XLA loop instead of
#: risking an opaque Mosaic scoped-vmem OOM (HTTP 500 / silent hang —
#: CLAUDE.md).
_VMEM_BUDGET = 92_000_000
_N_RESIDENT = 24


def _lane_padded_bytes(shape, itemsize):
    if len(shape) == 1:
        return shape[0] * itemsize
    sub, lane = shape[-2], shape[-1]
    return (((sub + 7) // 8) * 8 * ((lane + 127) // 128) * 128 * itemsize
            * (1 if len(shape) == 2 else shape[0]))


def _mosaic_safe_bc(bc):
    """BCs whose ghost slab is expressible without captured array
    constants: absent (zero-gradient mirror), zero-flux, or Value with a
    plain scalar. Gradient BCs build a node-distance array constant."""
    if bc is None:
        return True
    if bc.kind == "flux":
        return bc.value is None
    if bc.kind in ("value", "open"):
        return bc.value is None or isinstance(bc.value, (int, float))
    return False


def fused_substep_ok(grid, eta_bcs, n_bufs=_N_RESIDENT):
    """Static gate for the whole-loop kernel (see module docstring)."""
    from ..boundary_conditions.bcs import default_bcs
    from ..models.free_surface import ETA_LOC
    from ..utils.location import U_LOC, V_LOC

    if getattr(grid, "dist", (None, None, None)) != (None, None, None):
        return False
    if grid.topology[0] is FLAT or grid.topology[1] is FLAT:
        return False
    xt = grid.Nx + 2 * grid.Hx
    yt = grid.Ny + 2 * grid.Hy
    if n_bufs * _lane_padded_bytes((xt, yt),
                                   jnp.dtype(grid.dtype).itemsize) \
            > _VMEM_BUDGET:
        return False
    for loc, bcs in ((ETA_LOC, eta_bcs), (U_LOC, None), (V_LOC, None)):
        b = bcs if bcs is not None else default_bcs(grid, loc)
        for axis in (0, 1):
            if grid.topology[axis] is PERIODIC:
                continue
            pair = ((b.west, b.east), (b.south, b.north))[axis]
            if not all(_mosaic_safe_bc(bc) for bc in pair):
                return False
    return True


def fused_substep_eta(grid, eta_bcs, eta0, U0, V0, GU, GV, Hfc, Hcf,
                      g, dtau, wv, wf, n, interpret=None):
    """Run the N-substep barotropic loop in one Pallas call.

    All field arguments are SQUEEZED rank-2 with-halo (X, Y) arrays
    (substep_eta's fast-loop representation); ``Hfc``/``Hcf`` and the
    metric factors are read from ``grid`` inside the kernel via the
    squeezed 2D broadcast forms passed here. Returns (η̅ filled, U̅, V̅)
    exactly as the XLA loop does."""
    from ..boundary_conditions.bcs import default_bcs, fill_halos_axis
    from ..models.free_surface import ETA_LOC
    from ..utils.location import U_LOC, V_LOC
    from ..ops import stencil as st

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    dtype = eta0.dtype

    def sq2(m):
        """Squeeze (X, Y, 1) metrics to rank 2; keep scalars as python
        floats (compile-time splat constants in the kernel — exactly the
        values the XLA loop's msq() multiplies with)."""
        if getattr(m, "ndim", 0) == 3:
            return m[..., 0]
        if getattr(m, "ndim", 0) > 0:
            return m
        return float(m)
    dxu = sq2(grid.dx(U_LOC))
    dyv = sq2(grid.dy(V_LOC))
    dyu = sq2(grid.dy(U_LOC))
    dxv = sq2(grid.dx(V_LOC))
    az = sq2(grid.Az((C, C, C)))
    # metric/Δ factors may be scalars (rectilinear) — keep them out of
    # the ref list in that case and close over the python float
    metrics = {"dxu": dxu, "dyv": dyv, "dyu": dyu, "dxv": dxv, "az": az,
               "Hfc": sq2(Hfc), "Hcf": sq2(Hcf)}
    metric_names = [k for k, v in metrics.items() if getattr(v, "ndim", 0)]
    metric_arrays = [metrics[k] for k in metric_names]

    bcs_eta = eta_bcs if eta_bcs is not None else default_bcs(grid, ETA_LOC)
    bcs_u = default_bcs(grid, U_LOC)
    bcs_v = default_bcs(grid, V_LOC)
    order = sorted((0, 1), key=lambda a: grid.topology[a] is not PERIODIC)

    def fill(a, loc, bcs):
        pairs = ((bcs.west, bcs.east), (bcs.south, bcs.north))
        for axis in order:
            a = fill_halos_axis(a, grid, loc, axis, *pairs[axis],
                                concat=True)
        return a

    gs = jnp.asarray(g, dtype).reshape(1, 1)
    dts = jnp.asarray(dtau, dtype).reshape(1, 1)
    wvs = jnp.asarray(wv, dtype).reshape(-1, 1)
    wfs = jnp.asarray(wf, dtype).reshape(-1, 1)

    def kernel(g_ref, dt_ref, wv_ref, wf_ref, *refs):
        m = {k: refs[i][:] for i, k in enumerate(metric_names)}
        for k, v in metrics.items():
            if k not in metric_names:
                m[k] = v  # compile-time scalar
        eta0_r, U0_r, V0_r, GU_r, GV_r = refs[len(metric_names):
                                              len(metric_names) + 5]
        etaav_o, Uav_o, Vav_o = refs[len(metric_names) + 5:]
        gv = g_ref[0, 0]
        dtau_v = dt_ref[0, 0]
        GUb, GVb = GU_r[:], GV_r[:]

        def body(i, carry):
            eta, U, V, eta_av, U_av, V_av = carry
            eta = fill(eta, ETA_LOC, bcs_eta)
            U = U + dtau_v * (-gv * m["Hfc"] * st.dxf(eta) / m["dxu"] + GUb)
            V = V + dtau_v * (-gv * m["Hcf"] * st.dyf(eta) / m["dyv"] + GVb)
            U = fill(U, U_LOC, bcs_u)
            V = fill(V, V_LOC, bcs_v)
            eta = eta - dtau_v * (st.dxc(m["dyu"] * U)
                                  + st.dyc(m["dxv"] * V)) / m["az"]
            return (eta, U, V, eta_av + wf_ref[i, 0] * eta,
                    U_av + wv_ref[i, 0] * U, V_av + wv_ref[i, 0] * V)

        z = jnp.zeros_like(eta0_r[:])
        carry = (eta0_r[:], U0_r[:], V0_r[:], z, z, z)
        carry = jax.lax.fori_loop(0, n, body, carry)
        etaav_o[:] = fill(carry[3], ETA_LOC, bcs_eta)
        Uav_o[:] = carry[4]
        Vav_o[:] = carry[5]

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    def vmem(a):
        return pl.BlockSpec(tuple(pl.Element(s) for s in a.shape),
                            lambda i: (0,) * a.ndim)

    out_spec = pl.BlockSpec(tuple(pl.Element(s) for s in eta0.shape),
                            lambda i: (0, 0))
    out_shape = [jax.ShapeDtypeStruct(eta0.shape, dtype)] * 3
    field_inputs = [eta0, U0, V0, GU, GV]
    outs = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=([smem((1, 1))] * 2
                  + [smem(tuple(wvs.shape)), smem(tuple(wfs.shape))]
                  + [vmem(a) for a in metric_arrays]
                  + [vmem(a) for a in field_inputs]),
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(gs, dts, wvs, wfs, *metric_arrays, *field_inputs)
    return outs[0], outs[1], outs[2]
