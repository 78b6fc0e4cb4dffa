"""Fused Pallas tendencies for the hydrostatic (lat-lon) model.

The hydrostatic free-surface model is the reference's climate-scale
flagship (near-global lat-lon ocean,
/root/reference/validation/near_global_lat_lon/; tendency kernels in
/root/reference/src/Models/HydrostaticFreeSurfaceModels/
hydrostatic_free_surface_tendency_kernel_functions.jl:1-80). Its hot
terms — vector-invariant (or flux-form) momentum advection, tracer
advection, Coriolis, and the hydrostatic-pressure-anomaly gradient — are
evaluated here in ONE Pallas pass over (x, y) tiles with full-z windows,
exactly like the nonhydrostatic fused kernel (ops/fused_tendencies.py),
but on CURVILINEAR (lat-lon) and stretched grids: the y/z-dependent
metrics ride a stacked metric-pack input (ops/kernel_grid.py) whose 2D
rows broadcast against the 3D field blocks, the spherical Coriolis
parameter is rebuilt in-kernel from latitude rows, near-boundary
order-reduction masks work inside tiled windows via per-block iota
offsets, and immersed solid masks enter as 0/1 field inputs driving the
same conditional-flux selects as the jnp path.

The kernel REUSES the jnp flux/vorticity/coriolis functions verbatim on
VMEM blocks (``hydrostatic_advective_core`` below is called by BOTH the
model's jnp path and this kernel), so results are bit-identical by
construction — enforced by interpret-mode equivalence tests
(tests/test_fused_hydrostatic.py).

Terms outside the kernel (closures, forcings, boundary fluxes, the
explicit-free-surface gradient, immersed tendency masking) are pointwise
or cheap stencils the model adds on the XLA path afterwards.
"""
from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC
from .fused_tendencies import _COMPILER_PARAMS, _fast_div, _tile_sizes
from .kernel_grid import build_metric_pack, supports_metric_pack


def hydrostatic_advective_core(grid, scheme, tracer_scheme, coriolis,
                               tracer_names, u, v, w, tracers, pHY=None,
                               closure=None):
    """The hydrostatic model's advective/Coriolis/∂pHY′ tendency core
    (reference hydrostatic_free_surface_tendency_kernel_functions.jl:1-80)
    as one whole-array function of the metric protocol — shared verbatim
    by the jnp path (models/hydrostatic.py) and the fused Pallas kernel,
    which is what makes the two paths bit-identical.

    ``closure``: a kernel-expressible constant-coefficient
    ScalarDiffusivity (``kernel_closure``) whose EXPLICIT ν∇²/κ∇² terms
    are added here — ±1-reach stencils of the same metric protocol, so
    they run on VMEM blocks unchanged and the model skips its XLA-side
    diffusion pass (a vertically-implicit closure's z part stays in the
    operator-split solve either way)."""
    from ..advection.fluxes import div_Uc, div_vu, div_vv
    from ..advection.vector_invariant import VectorInvariant
    from ..closures.scalar_diffusivity import (momentum_diffusion,
                                               tracer_diffusion)
    from ..ops import stencil as st

    if isinstance(scheme, VectorInvariant):
        Gu = -scheme.U_dot_grad_u(grid, u, v, w)
        Gv = -scheme.U_dot_grad_v(grid, u, v, w)
    elif scheme is None:
        Gu = jnp.zeros_like(u)
        Gv = jnp.zeros_like(v)
    else:  # conservative flux form
        Gu = -div_vu(grid, scheme, u, v, w)
        Gv = -div_vv(grid, scheme, u, v, w)

    if coriolis is not None:
        Gu = Gu - coriolis.x_f_cross_U(grid, u, v, w)
        Gv = Gv - coriolis.y_f_cross_U(grid, u, v, w)

    if pHY is not None:
        Gu = Gu - st.dxf(pHY) / grid.dx(U_LOC)
        Gv = Gv - st.dyf(pHY) / grid.dy(V_LOC)

    if closure is not None:
        Gu = Gu + momentum_diffusion(u, grid, U_LOC, closure)
        Gv = Gv + momentum_diffusion(v, grid, V_LOC, closure)

    G = {"u": Gu, "v": Gv}
    for name in tracer_names:
        c = tracers[name]
        Gc = (-div_Uc(grid, tracer_scheme, u, v, w, c)
              if tracer_scheme is not None else jnp.zeros_like(c))
        if closure is not None:
            Gc = Gc + tracer_diffusion(c, grid, name, closure)
        G[name] = Gc
    return G


def kernel_closure(model):
    """The model's closure when its EXPLICIT part is expressible inside
    the fused kernel: a single constant-coefficient ScalarDiffusivity
    (scalar ν/κ — per-tracer κ dicts of scalars included), no immersed
    boundary (diffusive no-flux masking reads solid masks at flux
    locations the kernel doesn't carry). Returns None otherwise — the
    model then adds diffusion at the XLA level as before."""
    from ..closures.scalar_diffusivity import ScalarDiffusivity
    cl = model.closure
    if not isinstance(cl, ScalarDiffusivity):
        return None
    if getattr(model.grid, "immersed", None) is not None:
        return None

    def scalar_ok(v):
        if v is None:
            return True
        if isinstance(v, dict):
            return all(scalar_ok(x) for x in v.values())
        return not callable(v) and jnp.ndim(v) == 0
    if not all(scalar_ok(v) for v in (cl.nu, cl.kappa, cl.nu_z, cl.kappa_z)):
        return None
    return cl


def _kernel_schemes(model):
    """(flux-form momentum scheme or None, tracer scheme or None) — the
    schemes that flow through ``transport`` (and thus need masks/tables)."""
    from ..advection.schemes import AdvectionScheme
    sch = model.momentum_advection
    ts = model.tracer_advection
    flux_form = sch if isinstance(sch, AdvectionScheme) else None
    return flux_form, ts if isinstance(ts, AdvectionScheme) else None


def supports_fused_hydrostatic(model):
    """Static gate for the fused hydrostatic tendency kernel. Requires
    (y, z)-expressible metrics (regular λ/x; lat-lon or rectilinear; no
    partial cells), an undistributed grid, a kernel-expressible Coriolis
    (y-dependent f only), and — with an immersed boundary — halos wide
    enough that the conditional-flux stencils stay in-window."""
    if os.environ.get("CLIMA_NO_FUSED"):
        return False
    grid = model.grid
    if not supports_metric_pack(grid):
        return False
    parent = getattr(grid, "parent", grid)
    if parent.dist != (None, None, None):
        return False
    from ..grids.topology import FLAT
    if parent.topology[0] is FLAT or parent.topology[2] is FLAT:
        return False
    if parent.Nx < 2 or parent.Nz < 2 or parent.Hy < 1:
        return False
    from ..coriolis.coriolis import (BetaPlane, FPlane,
                                     HydrostaticSphericalCoriolis)
    cor = model.coriolis
    if cor is not None and not isinstance(
            cor, (FPlane, BetaPlane, HydrostaticSphericalCoriolis)):
        return False
    from ..advection.schemes import AdvectionScheme
    from ..advection.vector_invariant import VectorInvariant
    sch = model.momentum_advection
    if sch is not None and not isinstance(sch, (VectorInvariant,
                                                AdvectionScheme)):
        return False
    ts = model.tracer_advection
    if ts is not None and not isinstance(ts, AdvectionScheme):
        return False
    imm = getattr(grid, "immersed", None)
    if imm is not None:
        maxbuf = max((s.buffer for s in _kernel_schemes(model)
                      if s is not None and s.buffer > 0), default=0)
        if maxbuf and min(parent.Hx, parent.Hy) < maxbuf + 1:
            return False
    return True


def _block_perm(layout):
    """Physical block-axis permutation of a kernel layout (logical axis a
    lives at block axis perm[a]); None for the natural (x, y, z) blocks."""
    return {"zy": (0, 2, 1), "zxy": (1, 2, 0), "yz": None}[layout]


def _mirrorlike_bcs(bcs):
    """True when every x/y side of ``bcs`` fills by a pure wrap or
    zero-gradient mirror (kind None/periodic/communication/flux) — the
    condition under which a pointwise-per-column function F commutes with
    the halo fill, F(fill(b)) == fill(F(b)), which is what makes the
    in-kernel pHY′ bit-identical to the XLA fill-then-read path."""
    for axis, _side, bc in bcs.sides():
        if axis == 2:
            continue
        if bc is not None and bc.kind not in ("flux", "periodic",
                                              "communication"):
            return False
    return True


def supports_inkernel_wphy(model):
    """Static gate: may the fused hydrostatic kernel rebuild w (from
    continuity) and pHY′ (buoyancy integral) on its own VMEM blocks, so
    the model's step never materializes them at the XLA level?
    (reference computes both as separate GPU kernel launches —
    compute_w_from_continuity.jl:30-36, update_hydrostatic_pressure.jl —
    here they collapse into the tendency kernel: the ~2 field-sized
    streaming passes, their halo fills, and two kernel input windows all
    vanish.) Exactness requirements, each argued in the helper
    docstrings below: periodic x (computed-on-wrap == filled-wrap for
    the w columns the stencils read), scalar-valued w z-BCs (the kernel
    replays the exact ghost formulas via fill_halos_axis), mirror-like
    tracer x/y BCs for pHY′, a buoyancy whose perturbation is pointwise
    in the tracers, and a single y tile when y is bounded (the in-window
    y mirror fill needs the full row)."""
    from ..buoyancy.buoyancy import (BuoyancyTracer, LinearEquationOfState,
                                     SeawaterBuoyancy)
    from ..grids.topology import BOUNDED, PERIODIC
    if os.environ.get("CLIMA_NO_INKERNEL_W"):
        return False
    if not model.fused_advection or not supports_fused_hydrostatic(model):
        return False
    grid = model.grid
    parent = getattr(grid, "parent", grid)
    if parent.topology[0] is not PERIODIC:
        return False
    if parent.topology[2] is not BOUNDED:
        return False
    if (model.particles is not None or model.forcing
            or (model.closure is not None and kernel_closure(model) is None)):
        return False
    # w z-ghost formulas must be replayable on a block: scalar/None values
    for side in ("bottom", "top"):
        bc = getattr(model.w_bcs, side)
        if bc is not None and bc.value is not None:
            v = bc.value
            if callable(v) or getattr(v, "ndim", 0) > 0:
                return False
    b = model.buoyancy
    if b is not None:
        if tuple(b.gravity_unit_vector) != (0.0, 0.0, -1.0):
            return False
        if isinstance(b, SeawaterBuoyancy):
            if not isinstance(b.equation_of_state, LinearEquationOfState):
                return False  # nonlinear EOS reads z nodes (not in kg)
        elif not isinstance(b, BuoyancyTracer):
            return False
        for name in model.tracer_names:
            if not _mirrorlike_bcs(model.bcs[name]):
                return False
    # bounded y: the in-window mirror fill of w needs the full y row
    if parent.topology[1] is BOUNDED:
        plan = _plan_hydro_tiles(model)
        if plan is None or plan[1] != parent.Ny:
            return False
    return True


def supports_fused_hydro_advance(model):
    """Static gate for the fused ADVANCE (tendencies + AB2 substep in one
    Pallas pass, the hydrostatic analog of ops/fused_step.py): every
    tendency term must live inside the kernel (no closures, forcings,
    boundary-flux values, or immersed tendency masking — those are added
    to G at the XLA level after the kernel), the free surface must not
    add a G term either (explicit FS injects −g∇η post-kernel), and the
    kernel layout must need no per-step transposes (the (x, z, y) state
    layout, or natural blocks). G_prev is then stored x/y-interior in
    the kernel layout — the jnp.pad of G and the substep's entire
    HBM round trip (re-reading ψ, G, G⁻ and re-writing ψ′) vanish."""
    from ..models.free_surface import ExplicitFreeSurface
    if os.environ.get("CLIMA_NO_FUSED_STEP"):
        return False
    if not model.fused_advection:
        return False
    if (model.forcing or model.particles is not None
            or model.immersed_boundary is not None
            or (model.closure is not None and kernel_closure(model) is None)):
        return False
    if isinstance(model.free_surface, ExplicitFreeSurface):
        return False
    if len(model.tracer_names) > 5:
        # advance mode roughly doubles the resident VMEM windows (the
        # interior G_prev inputs + the second, G, output per field) while
        # the tile budget is sized for the plain tendency kernel —
        # hardware-validated only up to the flagship's 3 tracers, so
        # tracer-heavy configs keep the two-stage path instead of
        # risking a Mosaic scoped-vmem OOM (opaque HTTP 500 / hang)
        return False
    for name in model.prognostic_names():
        for _axis, _side, bc in model.bcs[name].sides():
            if bc is not None and bc.kind == "flux" and bc.value is not None:
                return False
    if getattr(model, "state_layout", None) == "xzy":
        return True
    return preferred_hydro_layout(model) == "yz"


def _budget_nfields(model):
    """Per-field VMEM budget divisor — deliberately counts w and pHY′ as
    if they were still kernel inputs even when rebuilt in-kernel (their
    VMEM temps are comparable to the windows they replace)."""
    return (3 + len(model.tracer_names) + int(model.buoyancy is not None)
            + len(_mask_locs(model)))


def _plan_hydro_tiles(model, layout=None):
    """(tx, ty) the fused hydrostatic kernel will use for this model (the
    exact budget/layout logic of ``fused_hydrostatic_tendencies``)."""
    import numpy as np
    parent = getattr(model.grid, "parent", model.grid)
    if layout is None:
        layout = ("zy" if getattr(model, "state_layout", None) == "xzy"
                  else preferred_hydro_layout(model))
    budget = int(12_000_000 / max(4, _budget_nfields(model)))
    args = (parent.Nx, parent.Ny, parent.Hx, parent.Hy,
            parent.Nz + 2 * parent.Hz)
    kw = dict(itemsize=np.dtype(parent.dtype).itemsize, budget_bytes=budget)
    if layout == "zy":
        return _tile_sizes_zy(*args, **kw)
    if layout == "zxy":
        return _tile_sizes_zxy(*args, **kw)
    return _tile_sizes(*args, **kw)


def _scan_sum(a, axis, reverse=False):
    """Inclusive prefix (or suffix) sum along ``axis`` as a Hillis–Steele
    doubling ladder of static pad-shift adds — ``jnp.cumsum`` lowers to a
    ``cumsum`` primitive Mosaic cannot lower inside a Pallas TPU kernel,
    while this is ⌈log₂ n⌉ full-block adds of ops Mosaic handles
    (slice/concatenate/add). n is tiny in the z column (≈ 24-75), so the
    extra FLOPs are noise; summation ORDER differs from the serial
    cumsum, so in-kernel w/pHY′ match the XLA path to reassociation
    precision (the equivalence tests' documented tolerance)."""
    n = a.shape[axis]
    shift = 1
    while shift < n:
        if reverse:
            kept = jax.lax.slice_in_dim(a, shift, n, axis=axis)
            zpad = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, shift, axis=axis))
            a = a + jax.lax.concatenate([kept, zpad], axis)
        else:
            kept = jax.lax.slice_in_dim(a, 0, n - shift, axis=axis)
            zpad = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, shift, axis=axis))
            a = a + jax.lax.concatenate([zpad, kept], axis)
        shift *= 2
    return a


def _w_block(kg, parent, w_bcs, ub, vb, layout):
    """w-from-continuity on a VMEM block — replays
    ``HydrostaticModel.compute_w`` + its halo fill exactly (reference
    compute_w_from_continuity.jl:30-36):

    * interior faces: w(k+1) = −Σ_{k'≤k} Δz ∇ₕ·(u, v) — same cumsum
      expression tree as the model path;
    * x halo columns need no fill: they are computed from the wrapped
      u, v columns the block window carries, so they EQUAL the wrap the
      XLA fill would write (gate requires periodic x);
    * bounded-y ghost columns and the z ghosts are rewritten with the
      very ``fill_halos_axis`` slab formulas the XLA path uses (legal on
      a block: those fills slice only the filled axis, and the gate
      guarantees the block spans it fully).

    Computed-vs-filled differs ONLY in y ghost columns of bounded-y
    grids before the explicit refill — which is why the refill happens —
    and in columns no tendency term reads (w is consumed at x offsets
    −1..+1, y offsets −1..+1, z offsets within the column)."""
    from ..boundary_conditions.bcs import fill_halos_axis
    from ..grids.topology import FLAT, PERIODIC
    from . import operators as op
    perm = _block_perm(layout)
    Hz, Nz = parent.Hz, parent.Nz
    zax = 2 if perm is None else perm[2]
    d = op.div_xy_ccc(ub, vb, kg)
    incr = jnp.broadcast_to(kg.dz(CENTER), d.shape) * d
    sl = [slice(None)] * 3
    sl[zax] = slice(Hz, Hz + Nz)
    cum = _scan_sum(incr[tuple(sl)], zax)
    # assemble by concatenation, NOT .at[].set — indexed updates trace to
    # a `scatter` primitive Mosaic cannot lower inside the kernel
    zt = d.shape[zax]

    def zeros_z(n):
        shp = list(d.shape)
        shp[zax] = n
        return jnp.zeros(tuple(shp), d.dtype)

    w = jax.lax.concatenate(
        [zeros_z(Hz + 1), -cum, zeros_z(zt - Hz - Nz - 1)], zax)
    if parent.topology[1] not in (PERIODIC, FLAT):
        w = fill_halos_axis(w, parent, W_LOC, 1, w_bcs.south, w_bcs.north,
                            perm=perm, concat=True)
    return fill_halos_axis(w, parent, W_LOC, 2, w_bcs.bottom, w_bcs.top,
                           perm=perm, concat=True)


def _ph_block(buoyancy, kg, parent, tracers, layout):
    """pHY′ on a VMEM block — replays
    ``buoyancy.hydrostatic_pressure_anomaly``'s permuted branch exactly
    (reference update_hydrostatic_pressure.jl): reversed cumsum of
    b̄ᶻ Δzᶠ over the interior faces, zeros in the (never-read) z halos.
    x/y ghost COLUMNS are simply computed from the tracer blocks' ghost
    columns: pHY′ is pointwise-per-column in b, so with wrap (x) or
    zero-gradient-mirror (y) tracer fills — the gate's requirement —
    F(fill(b)) == fill(F(b)) and the ghosts match the XLA path's
    pressure-bc fill bit for bit."""
    from . import stencil as st
    perm = _block_perm(layout)
    Hz, Nz = parent.Hz, parent.Nz
    zax = 2 if perm is None else perm[2]
    b = buoyancy.buoyancy_perturbation(kg, tracers)
    gz = buoyancy.gravity_unit_vector[2]
    if gz != -1.0:
        b = -gz * b
    S = st.izf(b) * kg.dz(W_LOC)
    sl = [slice(None)] * 3
    sl[zax] = slice(Hz + 1, Hz + Nz + 1)
    S_int = S[tuple(sl)]
    ph_int = -_scan_sum(S_int, zax, reverse=True)
    # concat assembly (scatter is unlowerable in-kernel; see _w_block)
    zt = b.shape[zax]

    def zeros_z(n):
        shp = list(b.shape)
        shp[zax] = n
        return jnp.zeros(tuple(shp), b.dtype)

    return jax.lax.concatenate(
        [zeros_z(Hz), ph_int, zeros_z(zt - Hz - Nz)], zax)


class _DuckImmersed:
    """In-kernel immersed boundary: solid masks as 0/1 VMEM blocks
    (``transport``'s ``_immersed_clear`` consumes them arithmetically)."""

    def __init__(self, masks):
        self._m = masks

    def mask_for(self, loc):
        return self._m[tuple(loc)]


def _mask_locs(model):
    """Solid-mask locations the kernel's conditional fluxes read."""
    if getattr(model.grid, "immersed", None) is None:
        return ()
    flux_form, ts = _kernel_schemes(model)
    locs = []
    if ts is not None and ts.buffer > 0:
        locs.append(CENTER)
    if flux_form is not None and flux_form.buffer > 0:
        locs += [U_LOC, V_LOC]
    return tuple(locs)


def _tile_sizes_zy(nx, ny, hx, hy, zt, itemsize=4, budget_bytes=3_000_000):
    """(TX, TY) for the TRANSPOSED (x, z, y) block layout: y is the lane
    dim — prefer TY maximizing lane efficiency ty / pad128(ty+2hy) — and
    z the sublane dim (pad to 8). The VMEM window is
    (tx+2hx)·pad8(zt)·pad128(ty+2hy)·itemsize."""
    def pad(v, m):
        return -(-v // m) * m

    z_pad = pad(zt, 8)
    best = None
    for ty in [d for d in range(1, ny + 1) if ny % d == 0]:
        if ty % 128 and ty != ny:
            # Blocked output specs need lane tiles 128-divisible or full
            continue
        ty_w = ty + 2 * hy
        lane_eff = ty / pad(ty_w, 128)
        for tx in [d for d in range(1, nx + 1) if nx % d == 0]:
            win = (tx + 2 * hx) * z_pad * pad(ty_w, 128) * itemsize
            if win > budget_bytes:
                continue
            score = (round(lane_eff, 3), tx * ty)
            if best is None or score > best[0]:
                best = (score, tx, ty)
    if best is None:
        return None
    return best[1], best[2]


def _tile_sizes_zxy(nx, ny, hx, hy, zt, itemsize=4, budget_bytes=3_000_000):
    """(TX, TY) for the (z, x, y) block layout: z is the leading (untiled,
    unpadded) dim, x the sublane (pad 8; blocked outputs need TX
    8-divisible or full), y the lane (TY 128-divisible or full). Scored
    by useful fraction of the padded window."""
    def pad(v, m):
        return -(-v // m) * m

    best = None
    for ty in [d for d in range(1, ny + 1) if ny % d == 0]:
        if ty % 128 and ty != ny:
            continue
        ty_w = ty + 2 * hy
        for tx in [d for d in range(1, nx + 1) if nx % d == 0]:
            if tx % 8 and tx != nx:
                continue
            tx_w = tx + 2 * hx
            win = zt * pad(tx_w, 8) * pad(ty_w, 128) * itemsize
            if win > budget_bytes:
                continue
            eff = (tx * ty) / (pad(tx_w, 8) * pad(ty_w, 128))
            key = (round(eff, 3), tx * ty)
            if best is None or key > best[0]:
                best = (key, tx, ty)
    if best is None:
        return None
    return best[1], best[2]


def preferred_hydro_layout(model):
    """The block layout the fused kernel would pick for this model (the
    heuristic of ``fused_hydrostatic_tendencies``, exposed so the model
    can decide its STORAGE layout to match — storing state (x, z, y)
    when the kernel runs "zy" kills both the per-step transposes around
    the kernel and the 128-lane padding tax on every XLA pass)."""
    from ..advection.schemes import WENO5
    parent = getattr(model.grid, "parent", model.grid)
    nz = parent.Nz
    zt = nz + 2 * parent.Hz
    ny = parent.Ny
    flux_form, ts_k = _kernel_schemes(model)
    any_weno = any(isinstance(s, WENO5) for s in (flux_form, ts_k)
                   if s is not None)
    need_yt = any_weno and not parent._axes[1].regular
    forced = os.environ.get("CLIMA_HYDRO_LAYOUT")
    lane_pad = (-(-zt // 128) * 128) / zt
    if forced:
        return forced
    if lane_pad >= 1.25 and ny >= 64 and not need_yt:
        return "zy"
    return "yz"


def zy_tiling_ok(model):
    """True when a legal "zy" tiling exists under the same VMEM budget
    ``fused_hydrostatic_tendencies`` will use — precondition for the
    model's (x, z, y) state layout."""
    import numpy as np
    parent = getattr(model.grid, "parent", model.grid)
    nfields = (3 + len(model.tracer_names) + int(model.buoyancy is not None)
               + len(_mask_locs(model)))
    budget = int(12_000_000 / max(4, nfields))
    return _tile_sizes_zy(
        parent.Nx, parent.Ny, parent.Hx, parent.Hy,
        parent.Nz + 2 * parent.Hz,
        itemsize=np.dtype(parent.dtype).itemsize,
        budget_bytes=budget) is not None


def fused_hydrostatic_tendencies(model, state, interpret=None, advance=None):
    """One fused pass: −U·∇(u,v) − f×U − ∇pHY′ and −∇·(U c) per tracer.
    Returns a dict of with-halo tendency arrays (x/y halo regions zero,
    like the jnp path's wrap-garbage there: downstream never reads G
    halos). Caller must have checked ``supports_fused_hydrostatic``.

    ``advance=(dt, euler)`` — the fused ADVANCE mode
    (``supports_fused_hydro_advance``): the AB2 substep happens on the
    VMEM blocks too (ψ′ = ψ + Δt((3/2+χ)G − (1/2+χ)G⁻), reference
    quasi_adams_bashforth_2.jl:70-104), G_prev arrives/leaves as
    x/y-INTERIOR arrays in the kernel layout (no pads, no halo-window
    DMA), and the return value becomes ``(sol′ interiors, G interiors)``.

    Ocean z columns are SHALLOW (nz ≈ 24-75), so the natural z-in-lanes
    block layout pads zt up to 128 lanes and wastes up to ~3.4× of the
    VPU (measured 378 vs 1620 M pts/s at zt=38 vs 128). When the padding
    waste is material the kernel instead runs on TRANSPOSED (x, z, y)
    blocks — y in the lane dim, z in sublanes (pad 8) — via the
    ``axis_permutation`` trace context (ops/stencil.py); inputs/outputs
    are transposed at the XLA level (~2 extra streaming passes, ≪ the
    VPU savings). ``CLIMA_HYDRO_LAYOUT=yz|zy`` (env) forces a layout."""
    from ..advection.schemes import WENO5
    from ..ops import stencil as st

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    grid = model.grid
    parent = getattr(grid, "parent", grid)
    imm = getattr(grid, "immersed", None)
    sol = state["solution"]
    # in-kernel w/pHY′ (supports_inkernel_wphy): the kernel rebuilds both
    # from its own u/v/tracer blocks — no w or pHY input windows, and the
    # model's step never materializes either at the XLA level
    in_k = bool(getattr(model, "wphy_in_kernel", False))
    u, v = sol["u"], sol["v"]
    w = None if in_k else state["w"]
    names = model.tracer_names
    scheme, ts = model.momentum_advection, model.tracer_advection
    cor = model.coriolis
    has_ph = model.buoyancy is not None and (in_k or "pHY" in state)

    nx, ny, nz = parent.shape
    hx, hy, hz = parent.halo
    zt = nz + 2 * hz
    dtype = u.dtype

    # -- metric pack -----------------------------------------------------
    from ..coriolis.coriolis import BetaPlane, HydrostaticSphericalCoriolis
    need_ynodes = ()
    if isinstance(cor, HydrostaticSphericalCoriolis):
        need_ynodes = (F,)
    elif isinstance(cor, BetaPlane):
        need_ynodes = (C, F)
    flux_form, ts_k = _kernel_schemes(model)
    any_weno = any(isinstance(s, WENO5) for s in (flux_form, ts_k)
                   if s is not None)
    need_yt = any_weno and not parent._axes[1].regular
    # layout choice: transpose when the z lane padding wastes ≥25% and a
    # y tile with decent lane efficiency exists. "zy" (x leading, z
    # sublane, y lane) measures fastest at ¼°: 17.2 ms vs 22.2 ms for
    # "zxy" (z leading, x sublane, y lane) — zxy's XLA-layout-matched
    # transposes are cheaper, but its 8-padded x sublane window at the
    # VMEM-budget-limited tx=8 wastes more VPU than the transposes cost
    # (zy's leading x dim is untiled and unpadded). Both are maintained;
    # CLIMA_HYDRO_LAYOUT=yz|zy|zxy (env) forces one.
    #
    # With the model's (x, z, y) STATE layout (state_layout == "xzy",
    # models/hydrostatic.py) the inputs arrive already transposed and the
    # outputs stay transposed — the "zy" kernel with zero layout traffic.
    pre_permuted = getattr(model, "state_layout", None) == "xzy"
    layout = "zy" if pre_permuted else preferred_hydro_layout(model)

    def _build_pack(lay):
        return build_metric_pack(
            grid, need_ynodes=need_ynodes,
            need_ztables=any_weno and not parent._axes[2].regular,
            need_ytables=need_yt, layout=lay)

    pack = _build_pack(layout)

    # -- near-boundary order reduction (absolute bounds + iota offsets) --
    from ..advection.schemes import reduced_order_masks
    rmasks = {}
    for s in (flux_form, ts_k):
        if s is None:
            continue
        for axis in (0, 1, 2):
            m = reduced_order_masks(parent, axis, s)
            if m is not None:
                rmasks[(axis, s.required_halo)] = m

    # -- coriolis/closure scalars ride SMEM (leaves may be traced) --------
    cor_leaves, cor_treedef = jax.tree_util.tree_flatten(cor)
    cor_smem = [jnp.asarray(l, dtype).reshape(1, 1) for l in cor_leaves]
    kcl = kernel_closure(model)
    cl_leaves, cl_treedef = jax.tree_util.tree_flatten(kcl)
    cl_smem = [jnp.asarray(l, dtype).reshape(1, 1) for l in cl_leaves]

    mask_locs = _mask_locs(model)
    mask_arrays = [imm.mask_for(l).astype(dtype) for l in mask_locs]

    n_tr = len(names)
    # budget divisor counts w/pHY even when rebuilt in-kernel — their
    # VMEM temps are comparable to the input windows they replace
    nfields = 3 + n_tr + int(model.buoyancy is not None) + len(mask_locs)
    budget = int(12_000_000 / max(4, nfields))
    if layout != "yz":
        fn = _tile_sizes_zxy if layout == "zxy" else _tile_sizes_zy
        sizes = fn(nx, ny, hx, hy, zt, itemsize=dtype.itemsize,
                   budget_bytes=budget)
        if sizes is None:  # no legal transposed tiling — fall back
            assert not pre_permuted, \
                "state_layout='xzy' requires a legal zy tiling (zy_tiling_ok)"
            layout = "yz"
            pack = _build_pack(layout)
    if layout != "yz":
        tx, ty = sizes
    else:
        tx, ty = _tile_sizes(nx, ny, hx, hy, zt, itemsize=dtype.itemsize,
                             budget_bytes=budget)
    n_out = 2 + n_tr

    # -- fused-advance extras (AB2 scalars via SMEM, interior G_prev) -----
    ab_smem = []
    gp_arrays = []
    if advance is not None:
        adt, euler = advance
        if (layout != "yz") and not pre_permuted:
            raise ValueError("fused advance requires a transpose-free "
                             "layout (supports_fused_hydro_advance)")
        chi = jnp.where(euler, -0.5, jnp.asarray(model.ab2_chi, dtype))
        ab_smem = [
            (1.5 + chi).astype(dtype).reshape(1, 1),
            (0.5 + chi).astype(dtype).reshape(1, 1),
            jnp.asarray(adt, dtype).reshape(1, 1),
        ]
        gp_arrays = [state["G_prev"][n] for n in ("u", "v") + tuple(names)]

    n_vel = 2 if in_k else 3
    field_inputs = [u, v] + ([] if in_k else [w]) + [sol[n] for n in names]
    ph_is_input = has_ph and not in_k
    if ph_is_input:
        field_inputs.append(state["pHY"])
    field_inputs += mask_arrays
    if layout == "zy" and not pre_permuted:
        field_inputs = [a.transpose(0, 2, 1) for a in field_inputs]
    elif layout == "zxy":
        field_inputs = [a.transpose(2, 0, 1) for a in field_inputs]
    has_pack = pack.pack is not None

    def kernel(*refs):
        k = 0
        cor_refs = refs[:len(cor_smem)]
        k += len(cor_smem)
        cl_refs = refs[k:k + len(cl_smem)]
        k += len(cl_smem)
        pack_ref = refs[k] if has_pack else None
        k += int(has_pack)
        f_refs = refs[k:k + n_vel + n_tr]
        k += n_vel + n_tr
        ph_ref = refs[k] if ph_is_input else None
        k += int(ph_is_input)
        m_refs = refs[k:k + len(mask_locs)]
        k += len(mask_locs)
        ab_refs = refs[k:k + len(ab_smem)]
        k += len(ab_smem)
        gp_refs = refs[k:k + len(gp_arrays)]
        k += len(gp_arrays)
        out_refs = refs[k:]

        jy = pl.program_id(0)
        jx = pl.program_id(1)
        offs = (jx * tx, jy * ty, 0)  # logical (x, y, z) element offsets
        kg = pack.kernel_grid(
            pack_ref[:] if has_pack else None,
            reduced_masks=rmasks or None, iota_offset=offs,
            immersed=(_DuckImmersed({tuple(l): r[:] for l, r in
                                     zip(mask_locs, m_refs)})
                      if mask_locs else None))
        cor_k = jax.tree_util.tree_unflatten(
            cor_treedef, [r[0, 0] for r in cor_refs])
        cl_k = jax.tree_util.tree_unflatten(
            cl_treedef, [r[0, 0] for r in cl_refs])

        ub, vb = f_refs[0][:], f_refs[1][:]
        wb = None if in_k else f_refs[2][:]
        tr_blocks = {n: f_refs[n_vel + i][:] for i, n in enumerate(names)}
        # input windows always carry x/y halos; outputs are interior tiles
        xsl = slice(hx, hx + tx)
        ysl = slice(hy, hy + ty)
        if layout == "zy":  # block dims are (x, z, y)
            sl = (xsl, slice(None), ysl)
            perm_ctx = st.axis_permutation((0, 2, 1))
        elif layout == "zxy":  # block dims are (z, x, y)
            sl = (slice(None), xsl, ysl)
            perm_ctx = st.axis_permutation((1, 2, 0))
        else:
            sl = (xsl, ysl, slice(None))
            perm_ctx = contextlib.nullcontext()
        with perm_ctx, _fast_div():
            if in_k:
                wb = _w_block(kg, parent, model.w_bcs, ub, vb, layout)
                ph_b = (_ph_block(model.buoyancy, kg, parent, tr_blocks,
                                  layout) if has_ph else None)
            else:
                ph_b = ph_ref[:] if has_ph else None
            G = hydrostatic_advective_core(
                kg, scheme, ts, cor_k, names, ub, vb, wb, tr_blocks,
                pHY=ph_b, closure=cl_k)
        if advance is None:
            for i, n in enumerate(("u", "v") + tuple(names)):
                out_refs[i][:] = G[n][sl]
            return
        # fused AB2 substep on the resident blocks: ψ′ = ψ + Δt(c1 G −
        # c2 G⁻) — the exact ab2_substep expression tree; G⁻ windows are
        # interior tiles, so no slicing
        c1s, c2s, dtv = (r[0, 0] for r in ab_refs)
        probs = [ub, vb] + [tr_blocks[n] for n in names]
        for i, n in enumerate(("u", "v") + tuple(names)):
            g_int = G[n][sl]
            out_refs[i][:] = probs[i][sl] + dtv * (c1s * g_int
                                                   - c2s * gp_refs[i][:])
            out_refs[n_out + i][:] = g_int

    smem = pl.BlockSpec((1, 1), lambda jy, jx: (0, 0),
                        memory_space=pltpu.SMEM)
    # single-y-tile index maps emit a LITERAL 0: Mosaic must statically
    # prove lane-dim window starts 128-aligned, and jy*ty with a
    # non-128-multiple full-row ty (e.g. 600) is unprovable even though
    # jy is always 0
    yoff = (lambda jy: jy * ty) if ny // ty > 1 else (lambda jy: 0)
    if layout == "zy":
        win = pl.BlockSpec(
            (pl.Element(tx + 2 * hx), pl.Element(zt),
             pl.Element(ty + 2 * hy)),
            lambda jy, jx: (jx * tx, 0, yoff(jy)))
        pack_win = pl.BlockSpec(
            (pl.Element(pack.n_rows), pl.Element(zt),
             pl.Element(ty + 2 * hy)),
            lambda jy, jx: (0, 0, yoff(jy)))
        out_spec = pl.BlockSpec((tx, zt, ty), lambda jy, jx: (jx, 0, jy))
        out_shape = jax.ShapeDtypeStruct((nx, zt, ny), dtype)
    elif layout == "zxy":
        win = pl.BlockSpec(
            (pl.Element(zt), pl.Element(tx + 2 * hx),
             pl.Element(ty + 2 * hy)),
            lambda jy, jx: (0, jx * tx, yoff(jy)))
        pack_win = pl.BlockSpec(
            (pl.Element(pack.n_rows), pl.Element(zt), pl.Element(1),
             pl.Element(ty + 2 * hy)),
            lambda jy, jx: (0, 0, 0, yoff(jy)))
        out_spec = pl.BlockSpec((zt, tx, ty), lambda jy, jx: (0, jx, jy))
        out_shape = jax.ShapeDtypeStruct((zt, nx, ny), dtype)
    else:
        win = pl.BlockSpec(
            (pl.Element(tx + 2 * hx), pl.Element(ty + 2 * hy),
             pl.Element(zt)),
            lambda jy, jx: (jx * tx, jy * ty, 0))
        # the pack window's index depends only on jy: with the y grid axis
        # OUTER, its DMA is skipped across the whole inner x sweep
        pack_win = pl.BlockSpec(
            (pl.Element(pack.n_rows), pl.Element(ty + 2 * hy),
             pl.Element(zt)),
            lambda jy, jx: (0, jy * ty, 0))
        out_spec = pl.BlockSpec((tx, ty, zt), lambda jy, jx: (jx, jy, 0))
        out_shape = jax.ShapeDtypeStruct((nx, ny, zt), dtype)

    # G_prev rides the SAME interior-tile window family as the outputs
    in_specs = ([smem] * (len(cor_smem) + len(cl_smem))
                + ([pack_win] if has_pack else [])
                + [win] * len(field_inputs)
                + [smem] * len(ab_smem) + [out_spec] * len(gp_arrays))
    inputs = (cor_smem + cl_smem + ([pack.pack] if has_pack else [])
              + field_inputs + ab_smem + gp_arrays)
    n_total_out = n_out * (2 if advance is not None else 1)

    outs = pl.pallas_call(
        kernel,
        grid=(ny // ty, nx // tx),
        in_specs=in_specs,
        out_specs=[out_spec] * n_total_out,
        out_shape=[out_shape] * n_total_out,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*inputs)

    all_names = ("u", "v") + tuple(names)
    if advance is not None:
        # interiors, kernel layout: (ψ′, G) — the model pads ψ′ back to
        # halo shape (halos refilled by update_state) and stores G
        # verbatim as next step's interior G_prev
        return ({n: outs[i] for i, n in enumerate(all_names)},
                {n: outs[n_out + i] for i, n in enumerate(all_names)})
    if pre_permuted:
        # outputs stay in the (x, z, y) state layout
        pad = ((hx, hx), (0, 0), (hy, hy))
        G = {"u": jnp.pad(outs[0], pad), "v": jnp.pad(outs[1], pad)}
        for i, n in enumerate(names):
            G[n] = jnp.pad(outs[2 + i], pad)
        return G
    if layout == "zy":
        outs = [o.transpose(0, 2, 1) for o in outs]
    elif layout == "zxy":
        outs = [o.transpose(1, 2, 0) for o in outs]
    pad = ((hx, hx), (hy, hy), (0, 0))
    G = {"u": jnp.pad(outs[0], pad), "v": jnp.pad(outs[1], pad)}
    for i, n in enumerate(names):
        G[n] = jnp.pad(outs[2 + i], pad)
    return G
