"""Fused AB2 advance: tendencies + hydrostatic-pressure gradient + AB2
substep in ONE Pallas pass.

The quasi-AB2 step of the nonhydrostatic model (reference
time_step.jl + quasi_adams_bashforth_2.jl:70-104) is, per prognostic
field: G = −∇·(v ψ) [− ∂pHY′]  then  ψ′ = ψ + Δt((3/2+χ)G − (1/2+χ)G⁻).
Run separately (fused_advective_tendencies → XLA substep pass) the
substep re-reads ψ, G, G⁻ and re-writes ψ′, G⁻ from HBM — ~1.4 GB of
pure streaming at 256³ fp32. Here the substep happens on the VMEM
blocks while they are still resident: the kernel reads (u, v, w,
tracers, pHY, G_prev…) windows once and writes (ψ′…, G…) interiors.

Results are identical to the separate path (same flux functions on the
same ConstMetricGrid, same substep expression tree; equivalence test in
tests/test_fused_tendencies.py). Scalars (Δt and the χ/Euler-selected
AB2 coefficients) ride SMEM refs so the whole step stays one traced jit.

Gating (`fused_step_ok`): the terms that live OUTSIDE the kernel in the
general model (coriolis, closures, forcings, Stokes drift, background
fields, boundary fluxes, immersed masking) must be absent; buoyancy must
point straight down so its only momentum contribution is the pHY′
gradient (reference update_hydrostatic_pressure.jl cancellation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC
from . import fused_tendencies as _ft
from .fused_tendencies import (ConstMetricGrid, _COMPILER_PARAMS, _fast_div,
                               _shift_rmasks, _tile_sizes, _zslim_in,
                               z_halo_free_ok)
from . import stencil as st


def fused_step_ok(model):
    """Static check: every tendency term of this model configuration is
    expressible inside the fused kernel (see module docstring). Coriolis
    rides the kernel for f-plane/β-plane (pointwise horizontal interps of
    in-VMEM blocks — no z shifts, so z_slim wrap safety is untouched;
    the f/β scalars arrive via SMEM and latitude rows via the metric
    pack, like the hydrostatic kernel's spherical Coriolis)."""
    from ..coriolis.coriolis import BetaPlane, FPlane
    if not model.fused_advection:
        return False
    if model.timestepper != "QuasiAdamsBashforth2":
        return False
    if model.coriolis is not None and not isinstance(model.coriolis,
                                                     (FPlane, BetaPlane)):
        return False
    if (model.stokes_drift is not None or model.forcing
            or model.background_fields or model.immersed_boundary is not None
            or model.particles is not None):
        return False
    if model.closure is not None and _step_kernel_closure(model) is None:
        return False
    b = model.buoyancy
    if b is not None and tuple(b.gravity_unit_vector) != (0.0, 0.0, -1.0):
        return False
    if getattr(model.grid, "dist", (None, None, None)) != (None, None, None):
        return False
    for name in model.prognostic_names():
        for _axis, _side, bc in model.bcs[name].sides():
            if bc is not None and bc.kind == "flux" and bc.value is not None:
                return False
    return True


def _step_kernel_closure(model):
    """The model's closure when expressible inside the fused AB2 advance:
    a constant-coefficient ScalarDiffusivity (``kernel_closure``) whose
    explicit VERTICAL part is also exact on the kernel's blocks — under
    z_slim there are no z halos, so the wall-face diffusive flux is
    zeroed explicitly (``_diffusion_block``), which equals the XLA
    mirror-fill path bit-for-bit ONLY for zero-gradient (flux/None) z
    walls; Value/Gradient z walls keep the XLA-side diffusion."""
    from ..grids.topology import BOUNDED
    from .fused_hydrostatic import kernel_closure
    cl = kernel_closure(model)
    if cl is None:
        return None
    if cl.vertically_implicit:
        return cl  # vertical handled by the operator-split solve
    if model.grid.topology[2] is BOUNDED:
        for name in model.prognostic_names():
            for side in ("bottom", "top"):
                bc = getattr(model.bcs[name], side)
                if bc is not None and bc.kind not in ("flux",) \
                        and not (name == "w" and bc.kind == "open"
                                 and not callable(bc.value)
                                 and float(bc.value or 0.0) == 0.0):
                    return None
    return cl


def _diffusion_block(c, cg, loc, kh, kz, z_bounded, z_slim, vertical):
    """``div_kappa_grad``'s exact expression tree on a kernel block
    (closures/scalar_diffusivity.py:110-145, reference
    abstract_scalar_diffusivity_closure.jl ∇·(κ∇c)). Kept as a mirror
    rather than a direct call because the z_slim wall-flux needs the
    concat fix-up below mid-expression; any edit to div_kappa_grad MUST
    be replayed here — the fused-vs-plain step equivalence tests
    (tests/test_fused_tendencies.py closure cases) pin the two paths
    equal and will catch a desync. Under z_slim +
    bounded z, c carries no z ghosts: for z-at-C fields the wall-face
    vertical flux (slim face 0, and face nz ≡ wrap-to-0) is zeroed by
    concatenation — bit-equal to the XLA path's zero-gradient mirror
    ghost, whose wall flux is κ(c_ghost − c_wall-cell) ≡ exact 0. w
    (z-at-F) needs no fix-up: both walls carry the same imposed 0, so
    the wrap reads the right value."""
    from ..ops import operators as op
    from ..utils.location import C as _C
    fx = cg.Ax(op.flip_loc(loc, 0)) * (kh * op.dd(c, cg, 0, loc))
    fy = cg.Ay(op.flip_loc(loc, 1)) * (kh * op.dd(c, cg, 1, loc))
    out = (op.delta(fx, 0, op.flip_loc(loc, 0))
           + op.delta(fy, 1, op.flip_loc(loc, 1)))
    if vertical:
        fz = cg.Az(op.flip_loc(loc, 2)) * (kz * op.dd(c, cg, 2, loc))
        if z_slim and z_bounded and loc[2] is _C:
            fz = jax.lax.concatenate(
                [jnp.zeros_like(fz[:, :, :1]), fz[:, :, 1:]], 2)
        out = out + op.delta(fz, 2, op.flip_loc(loc, 2))
    return out / cg.V(loc)


def fused_ab2_advance(model, state, dt, euler, interpret=None,
                      interior_velocities=False):
    """One fused pass: returns (sol_new, G) — sol_new as with-halo arrays
    (x/y halo regions zeroed — the caller's update_state refills them),
    and G in the layout of ``state["G_prev"]``: HALO-FREE (nx, ny, nz)
    under z_slim (the kernel only ever reads G_prev interiors, so storing
    halos costs a ~0.6 GB/step jnp.pad plus ~55% halo-window DMA
    amplification on the G_prev reads, for nothing), with-halo otherwise.
    Bit-compatible with tendencies() + ab2_substep() on the interior.

    ``interior_velocities=True`` (z_slim callers only) returns u/v/w as
    the RAW kernel interiors (nx, ny, nz) instead of padding them — the
    model's fast roll-based projection consumes interiors directly and
    pads ONCE after the correction, saving the pad→interior-slice→
    ``.at[sl].set`` round trip (~0.9 GB of streaming at 256³ fp32)."""
    from ..advection.schemes import reduced_order_masks
    from ..advection.fluxes import div_Uc, div_vu, div_vv, div_vw

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    grid = model.grid
    scheme = model.advection
    tracer_scheme = model.tracer_advection
    sol = state["solution"]
    G_prev = state["G_prev"]
    names = model.tracer_names
    nfields = 3 + len(names)

    nx, ny, nz = grid.shape
    hx, hy, hz = grid.halo
    zt = nz + 2 * hz
    # z-halo-free blocks: every VPU value carries exactly nz lanes (2 full
    # vregs at 256³ instead of 262 padded to 384 — ~33% less VPU work on
    # the step's dominant kernel); see z_halo_free_ok for the exactness
    # argument (periodic wrap / impenetrable walls).
    z_slim = z_halo_free_ok(grid, model.bcs.get("w"))
    zk = nz if z_slim else zt
    z_dma = z_slim and _ft.Z_SLIM_DMA and nz % 128 == 0
    zw = nz if z_dma else zt
    z_off = hz if z_dma else 0
    rmasks = {}
    for sch in (scheme, tracer_scheme):
        m = reduced_order_masks(grid, 2, sch)
        if m is not None:
            rmasks[(2, sch.required_halo)] = m
    if z_slim:
        rmasks = _shift_rmasks(rmasks, hz)
    # metric grid: scalars for regular axes; stretched-z Δz/WENO-table
    # rows ride a metric-pack input (z_slim is regular-z only, so pack
    # rows always span the full zt window). See fused_tendencies.
    from ..advection.schemes import WENO5
    from ..coriolis.coriolis import BetaPlane
    from .kernel_grid import build_metric_pack
    any_weno = any(isinstance(s, WENO5) for s in (scheme, tracer_scheme))
    cor = model.coriolis
    pack = build_metric_pack(
        grid, need_ztables=any_weno and not grid.z_regular,
        need_ynodes=(C, F) if isinstance(cor, BetaPlane) else ())
    has_pack = pack.pack is not None
    # Coriolis scalars (f or f0/β — leaves may be traced) ride SMEM; the
    # object is rebuilt in-kernel, exactly like the hydrostatic kernel
    cor_leaves, cor_treedef = jax.tree_util.tree_flatten(cor)
    cor_smem = [jnp.asarray(l, grid.dtype).reshape(1, 1) for l in cor_leaves]
    # kernel-expressible closure (gate: _step_kernel_closure) — same SMEM
    # treatment; its explicit diffusion runs on the blocks
    kcl = _step_kernel_closure(model) if model.closure is not None else None
    cl_leaves, cl_treedef = jax.tree_util.tree_flatten(kcl)
    cl_smem = [jnp.asarray(l, grid.dtype).reshape(1, 1) for l in cl_leaves]
    from ..grids.topology import BOUNDED
    z_bounded = grid.topology[2] is BOUNDED

    has_ph = model.buoyancy is not None and "pHY" in state
    dxu = pack.scalars[("dx", F, C)]
    dyv = pack.scalars[("dy", F)]

    # AB2 coefficients, exactly as timesteppers.ab2_substep builds them
    chi = jnp.where(euler, -0.5, jnp.asarray(model.ab2_chi, grid.dtype))
    c1 = (1.5 + chi).astype(grid.dtype).reshape(1, 1)
    c2 = (0.5 + chi).astype(grid.dtype).reshape(1, 1)
    dts = jnp.asarray(dt, grid.dtype).reshape(1, 1)

    # budget tiles by the DMA window lane count zw, not the slim zk — see
    # the matching note in fused_tendencies.fused_advective_tendencies.
    # The bf16-smoothness variant's cast temps measure +20 MB of Mosaic
    # stack at the 12 MB pick (120.65M vs the 112M scoped-vmem limit), so
    # it gets a smaller window budget (one tile class down: (16,64) at
    # 256³ instead of (8,128), 102M of stack).
    bf16s = bool(getattr(scheme, "bf16_smoothness", False)
                 or getattr(tracer_scheme, "bf16_smoothness", False))
    budget = 11_000_000 if bf16s else 13_000_000
    tx, ty = _tile_sizes(nx, ny, hx, hy, zw, itemsize=sol["u"].dtype.itemsize,
                         budget_bytes=int(budget / max(4, nfields)))

    field_names = ("u", "v", "w") + tuple(names)

    # G layout: under z_slim, G_prev is stored HALO-FREE (nx, ny, nz) —
    # the kernel reads only G_prev interiors, so halo storage would cost
    # a jnp.pad of 4 fields (~0.6 GB/step) plus ~55% halo-window DMA
    # amplification on the G_prev reads, all discarded. The blocked
    # (tx, ty, nz) windows are tiling-aligned (ty ≡ 0 mod 8, nz full).
    g_interior = z_slim
    gp_interior = tuple(G_prev["u"].shape[-3:]) == (nx, ny, nz)
    if gp_interior and not z_slim:
        # cross-config state (e.g. checkpoint written under z_slim,
        # resumed with CLIMA_NO_ZSLIM): re-inflate G_prev with halos
        G_prev = {n: jnp.pad(v, ((hx, hx), (hy, hy), (hz, hz)))
                  for n, v in G_prev.items()}
        gp_interior = False

    def kernel(c1_ref, c2_ref, dt_ref, *refs):
        cor_refs = refs[:len(cor_smem)]
        refs = refs[len(cor_smem):]
        cl_refs = refs[:len(cl_smem)]
        refs = refs[len(cl_smem):]
        if has_pack:
            pack_ref, refs = refs[0], refs[1:]
        # under z_slim the field blocks carry nz lanes; slice the pack
        # rows to match (z_slim implies regular z, so no table rows whose
        # wrap entries the slice could corrupt)
        pack_block = None
        if has_pack:
            pack_block = _zslim_in(pack_ref[:], hz, zk) if z_slim \
                else pack_ref[:]
        cg = pack.kernel_grid(pack_block, reduced_masks=rmasks or None)
        cor_k = jax.tree_util.tree_unflatten(
            cor_treedef, [r[0, 0] for r in cor_refs])
        prog = refs[:nfields]
        ph_b = _zslim_in(refs[nfields][:], hz, zk) if has_ph else None
        gp = refs[nfields + int(has_ph): nfields + int(has_ph) + nfields]
        outs = refs[nfields + int(has_ph) + nfields:]
        ub = _zslim_in(prog[0][:], hz, zk)
        vb = _zslim_in(prog[1][:], hz, zk)
        wb = _zslim_in(prog[2][:], hz, zk)
        sl = (slice(hx, hx + tx) if ub.shape[0] > tx else slice(None),
              slice(hy, hy + ty) if ub.shape[1] > ty else slice(None),
              slice(None))
        c1s, c2s, dtv = c1_ref[0, 0], c2_ref[0, 0], dt_ref[0, 0]
        with _fast_div():
            G = [-div_vu(cg, scheme, ub, vb, wb),
                 -div_vv(cg, scheme, ub, vb, wb),
                 -div_vw(cg, scheme, ub, vb, wb)]
            if cor_k is not None:
                # term order matches the jnp path: advection → coriolis
                # → pHY′ (f-plane/β-plane: x/y interps only, z_slim-safe)
                G[0] = G[0] - cor_k.x_f_cross_U(cg, ub, vb, wb)
                G[1] = G[1] - cor_k.y_f_cross_U(cg, ub, vb, wb)
                G[2] = G[2] - cor_k.z_f_cross_U(cg, ub, vb, wb)
            if has_ph:
                G[0] = G[0] - st.dxf(ph_b) / dxu
                G[1] = G[1] - st.dyf(ph_b) / dyv
            if kcl is not None:
                # explicit ν∇²: same position in the term order as the
                # jnp path (advection → coriolis → pHY′ → diffusion)
                cl_k = jax.tree_util.tree_unflatten(
                    cl_treedef, [r[0, 0] for r in cl_refs])
                nu = cl_k.nu
                nu_z = cl_k.nu_z if cl_k.nu_z is not None else cl_k.nu
                vert = not kcl.vertically_implicit
                G[0] = G[0] + _diffusion_block(ub, cg, U_LOC, nu, nu_z,
                                               z_bounded, z_slim, vert)
                G[1] = G[1] + _diffusion_block(vb, cg, V_LOC, nu, nu_z,
                                               z_bounded, z_slim, vert)
                G[2] = G[2] + _diffusion_block(wb, cg, W_LOC, nu, nu_z,
                                               z_bounded, z_slim, vert)
            for k in range(len(names)):
                cb = _zslim_in(prog[3 + k][:], hz, zk)
                Gc = -div_Uc(cg, tracer_scheme, ub, vb, wb, cb)
                if kcl is not None:
                    kap = cl_k.kappa_for(names[k])
                    kap_z = cl_k.kappa_z_for(names[k])
                    Gc = Gc + _diffusion_block(cb, cg, CENTER, kap, kap_z,
                                               z_bounded, z_slim, vert)
                G.append(Gc)
        probs = [ub, vb, wb] + [_zslim_in(prog[3 + k][:], hz, zk)
                                for k in range(len(names))]
        for k in range(nfields):
            g_int = G[k][sl]
            gpk = gp[k][:] if gp_interior else _zslim_in(gp[k][:],
                                                         hz, zk)[sl]
            outs[k][:] = probs[k][sl] + dtv * (c1s * g_int - c2s * gpk)
            outs[nfields + k][:] = g_int

    win = pl.BlockSpec(
        (pl.Element(tx + 2 * hx), pl.Element(ty + 2 * hy), pl.Element(zw)),
        lambda i, j: (i * tx, j * ty, z_off))
    pack_win = pl.BlockSpec(
        (pl.Element(pack.n_rows), pl.Element(ty + 2 * hy), pl.Element(zt)),
        lambda i, j: (0, j * ty, 0))
    gp_win = (pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0))
              if gp_interior else win)
    smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((tx, ty, zk), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((nx, ny, zk), sol["u"].dtype)

    inputs = [sol[n] for n in field_names]
    if has_ph:
        inputs.append(state["pHY"])

    outs = pl.pallas_call(
        kernel,
        grid=(nx // tx, ny // ty),
        in_specs=([smem] * (3 + len(cor_smem) + len(cl_smem))
                  + ([pack_win] if has_pack else [])
                  + [win] * len(inputs) + [gp_win] * nfields),
        out_specs=[out_spec] * (2 * nfields),
        out_shape=[out_shape] * (2 * nfields),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(c1, c2, dts, *cor_smem, *cl_smem,
      *(([pack.pack] if has_pack else []) + inputs),
      *[G_prev[n] for n in field_names])

    if interior_velocities and not z_slim:
        raise ValueError("interior_velocities requires the z_slim kernel "
                         "(the caller gates on model.g_interior)")
    pad = ((hx, hx), (hy, hy), (hz, hz) if z_slim else (0, 0))
    sol_new = {n: (outs[k] if interior_velocities and n in ("u", "v", "w")
                   else jnp.pad(outs[k], pad))
               for k, n in enumerate(field_names)}
    if g_interior:
        G = {n: outs[nfields + k] for k, n in enumerate(field_names)}
    else:
        G = {n: jnp.pad(outs[nfields + k], pad)
             for k, n in enumerate(field_names)}
    return sol_new, G
