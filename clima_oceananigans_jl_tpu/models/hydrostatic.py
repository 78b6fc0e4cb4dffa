"""Hydrostatic free-surface (primitive-equation) model.

TPU re-design of /root/reference/src/Models/HydrostaticFreeSurfaceModels/
(hydrostatic_free_surface_model.jl, hydrostatic_free_surface_tendency_
kernel_functions.jl, hydrostatic_free_surface_ab2_step.jl:14-27,
compute_w_from_continuity.jl, barotropic_pressure_correction.jl):

  ∂t u = G_u − g∂x η(explicit) ,  G_u = −U·∇u − f×u|x − ∂x pHY′ + ∇·τ + Fu
  ∂t c = −∇·(U c) + ∇·(κ∇c) + Fc
  w    = −∫_{-H}^z ∇h·u dz'          (continuity, diagnosed)
  ∂t η = −∇h·U                       (stepped per the free-surface treatment)

Prognostic state: (u, v, tracers, η); w and pHY′ are diagnosed in
``update_state``. Time stepping is quasi-AB2 with the free-surface step
split out (explicit / implicit-solve / split-explicit barotropic
substepping) exactly as in the reference; the whole step is one jitted
pure function of ``(state, Δt)``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..advection.fluxes import div_Uc, div_vu, div_vv
from ..advection.schemes import AdvectionScheme, CenteredSecondOrder
from ..advection.vector_invariant import VectorInvariant
from ..boundary_conditions.bcs import (FieldBCs, FluxBC, OpenBC, apply_flux_bcs,
                                       apply_immersed_flux_bcs,
                                       fill_halos, regularize_bcs)
from ..buoyancy.buoyancy import hydrostatic_pressure_anomaly
from ..closures.implicit_vertical_diffusion import implicit_step_fields
from ..closures.scalar_diffusivity import (compute_closure_diffusivities,
                                           momentum_diffusion, tracer_diffusion)
from ..fields.field import Field
from ..grids.topology import BOUNDED, FLAT
from ..ops import operators as op
from ..ops import stencil as st
from ..timesteppers.steppers import Clock, ab2_substep
from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC
from .free_surface import (ETA_LOC, ExplicitFreeSurface, ImplicitFreeSurface,
                           SplitExplicitFreeSurface, barotropic_mode,
                           div_xy_2d, fill2d, grad_x, grad_y)


@jax.tree_util.register_pytree_node_class
class HydrostaticFreeSurfaceModel:
    def __init__(self, grid, momentum_advection="default",
                 tracer_advection="default",
                 free_surface=None, buoyancy=None, coriolis=None, closure=None,
                 tracers=None, forcing=None, boundary_conditions=None,
                 particles=None, immersed_boundary=None,
                 fused_advection="auto"):
        if grid.topology[2] is FLAT:
            raise ValueError("HydrostaticFreeSurfaceModel needs a z direction")
        # None explicitly disables a term (reference `advection = nothing`)
        self.momentum_advection = (VectorInvariant()
                                   if momentum_advection == "default"
                                   else momentum_advection)
        self.tracer_advection = (CenteredSecondOrder()
                                 if tracer_advection == "default"
                                 else tracer_advection)
        names = list(tracers) if tracers is not None else []
        if buoyancy is not None:
            for t in buoyancy.required_tracers:
                if t not in names:
                    names.append(t)
        for cl in (closure if isinstance(closure, (tuple, list)) else (closure,)):
            for t in getattr(cl, "required_tracers", ()):
                if t not in names:
                    names.append(t)
        self.tracer_names = tuple(names)
        h_req = max(getattr(self.momentum_advection, "required_halo", 1),
                    getattr(self.tracer_advection, "required_halo", 1), 1)
        want_fused = (fused_advection is True
                      or (fused_advection == "auto"
                          and jax.default_backend() == "tpu"))
        hx = hy = h_req
        if want_fused:
            # fused Pallas tendencies: x/y halos multiples of 4 so the
            # tiled windows' sublane dims are 8-divisible in every block
            # layout (ops/fused_hydrostatic.py); with an immersed boundary
            # the conditional fluxes read ±(buffer+1), which must stay
            # in-window
            if immersed_boundary is not None:
                from ..advection.schemes import AdvectionScheme
                hb = max((s.buffer + 1 for s in (self.momentum_advection,
                                                 self.tracer_advection)
                          if isinstance(s, AdvectionScheme) and s.buffer > 0),
                         default=0)
                hx = hy = max(h_req, hb)
            hx = -(-hx // 4) * 4
            hy = -(-hy // 4) * 4
        self.grid = grid.with_halo((hx, hy, h_req))
        # immersed boundary: masks built on the final grid, grid wrapped
        # (reference ImmersedBoundaryGrid) so flux-form advection applies
        # conditional near-solid fluxes; PartialCellBottom additionally
        # installs 3D vertical metrics. VectorInvariant momentum relies on
        # the state/tendency masking alone (first-order at the boundary).
        if immersed_boundary is not None and hasattr(immersed_boundary, "build"):
            immersed_boundary = immersed_boundary.build(self.grid)
        self.immersed_boundary = immersed_boundary
        if immersed_boundary is not None:
            from ..immersed.immersed import ImmersedGrid
            self.grid = ImmersedGrid.wrap(self.grid, immersed_boundary)
        self.free_surface = (free_surface if free_surface is not None
                             else ImplicitFreeSurface())
        self.buoyancy = buoyancy
        self.coriolis = coriolis
        self.closure = closure
        self.particles = particles  # LagrangianParticles or None
        from ..forcings.forcing import regularize_forcing
        self.forcing = {k: regularize_forcing(k, v)
                        for k, v in (forcing or {}).items()}
        self.ab2_chi = 0.1
        user_bcs = boundary_conditions or {}
        self.bcs = {
            "u": regularize_bcs(self.grid, U_LOC, user_bcs.get("u")),
            "v": regularize_bcs(self.grid, V_LOC, user_bcs.get("v")),
        }
        for n in self.tracer_names:
            self.bcs[n] = regularize_bcs(self.grid, CENTER, user_bcs.get(n))
        self.eta_bcs = regularize_bcs(self.grid, ETA_LOC, user_bcs.get("eta"))
        # w halos: zero-gradient in z so the continuity-diagnosed top face survives
        wb = regularize_bcs(self.grid, W_LOC, user_bcs.get("w"))
        if self.grid.topology[2] is BOUNDED:
            wb.bottom = OpenBC(0.0)
            wb.top = FluxBC()
        self.w_bcs = wb
        self.pressure_bcs = regularize_bcs(self.grid, CENTER, None)
        from ..ops.fused_hydrostatic import (supports_fused_hydro_advance,
                                             supports_fused_hydrostatic,
                                             supports_inkernel_wphy)
        self.fused_advection = bool(want_fused
                                    and supports_fused_hydrostatic(self))
        self.state_layout = self._pick_state_layout()
        # w-from-continuity and pHY′ rebuilt inside the fused kernel:
        # the state carries NEITHER (diagnostics recompute on demand)
        self.wphy_in_kernel = supports_inkernel_wphy(self)
        # fused ADVANCE: tendencies + the AB2 substep in ONE Pallas pass;
        # G_prev is stored x/y-INTERIOR in the kernel layout (the substep
        # never rereads ψ/G/G⁻ from HBM and G is never padded)
        self.fused_advance = supports_fused_hydro_advance(self)

    def _pick_state_layout(self):
        """(x, z, y) state storage for shallow-z grids: the natural
        (x, y, z) layout puts z in the 128-padded lane dimension, so a
        zt ≈ 30 field streams 4.3× its useful bytes through EVERY XLA
        pass (fills, w-from-continuity, pHY′, substep). Storing the 3D
        state transposed (y in lanes, z in 8-padded sublanes) removes
        that tax AND matches the fused kernel's "zy" block layout, so the
        per-step transposes around the kernel vanish too (ops/permuted.py).
        Gated to configurations whose step stays fully layout-aware."""
        from ..ops.fused_hydrostatic import preferred_hydro_layout, zy_tiling_ok
        if os.environ.get("CLIMA_NO_XZY"):
            return None
        if not self.fused_advection:
            return None
        if preferred_hydro_layout(self) != "zy" or not zy_tiling_ok(self):
            return None
        parent = getattr(self.grid, "parent", self.grid)
        if parent.dist != (None, None, None):
            return None
        from ..ops.fused_hydrostatic import kernel_closure
        if self.closure is not None and (
                kernel_closure(self) is None
                or getattr(self.closure, "vertically_implicit", False)):
            # in-kernel diffusion keeps the permuted step layout-aware;
            # the implicit vertical solve assumes natural z-last arrays
            return None
        if (self.immersed_boundary is not None
                or self.particles is not None or self.forcing):
            return None
        # tendency-level boundary fluxes and discrete-form BCs evaluate
        # in the natural orientation — keep those configs there
        for bcs in list(self.bcs.values()) + [self.w_bcs]:
            for _a, _s, bc in bcs.sides():
                if bc is not None and (bc.discrete or
                                       (bc.kind == "flux" and bc.value is not None)):
                    return None
        return "xzy"

    @property
    def _perm(self):
        """Physical axis permutation of the 3D state (None = natural)."""
        from ..ops.permuted import XZY
        return XZY if self.state_layout == "xzy" else None

    # -- pytree ---------------------------------------------------------------
    def tree_flatten(self):
        leaves = (self.grid, self.free_surface, self.buoyancy, self.coriolis,
                  self.closure, self.bcs, self.eta_bcs, self.w_bcs,
                  self.pressure_bcs, self.particles, self.immersed_boundary)
        fk = tuple(sorted(self.forcing))
        static = (self.momentum_advection, self.tracer_advection,
                  self.tracer_names, self.ab2_chi, fk,
                  tuple(self.forcing[k] for k in fk), self.fused_advection,
                  self.state_layout, self.wphy_in_kernel, self.fused_advance)
        return leaves, static

    @classmethod
    def tree_unflatten(cls, static, leaves):
        obj = object.__new__(cls)
        (obj.grid, obj.free_surface, obj.buoyancy, obj.coriolis, obj.closure,
         obj.bcs, obj.eta_bcs, obj.w_bcs, obj.pressure_bcs,
         obj.particles, obj.immersed_boundary) = leaves
        (obj.momentum_advection, obj.tracer_advection, obj.tracer_names,
         obj.ab2_chi, fk, fv, obj.fused_advection, obj.state_layout,
         obj.wphy_in_kernel, obj.fused_advance) = static
        obj.forcing = dict(zip(fk, fv))
        return obj

    # -- state ----------------------------------------------------------------
    def prognostic_names(self):
        return ("u", "v") + self.tracer_names

    def _locs(self):
        locs = dict(u=U_LOC, v=V_LOC)
        for n in self.tracer_names:
            locs[n] = CENTER
        return locs

    @property
    def _explicit_fs(self):
        return isinstance(self.free_surface, ExplicitFreeSurface)

    # -- fused-advance interior G_prev helpers ---------------------------------
    def _int_cut(self):
        """x/y-interior slicer in the state layout (z keeps its halos —
        G z-halo garbage is refilled with ψ′'s halos every step)."""
        g = self.grid
        xs = slice(g.Hx, g.Hx + g.Nx)
        ys = slice(g.Hy, g.Hy + g.Ny)
        return (xs, slice(None), ys) if self._perm is not None \
            else (xs, ys, slice(None))

    def _int_pad(self):
        g = self.grid
        return (((g.Hx, g.Hx), (0, 0), (g.Hy, g.Hy))
                if self._perm is not None
                else ((g.Hx, g.Hx), (g.Hy, g.Hy), (0, 0)))

    def _coerce_gprev(self, state):
        """Cross-gate checkpoints: slice a halo-shaped G_prev to interior
        when this model runs the fused advance, pad an interior one with
        zero halos when it doesn't (both exact — G x/y halos are never
        read, and ψ′ halos are refilled before any read)."""
        gp = state.get("G_prev")
        if not isinstance(gp, dict):
            return state
        g = self.grid
        zt = g.total_shape[2]
        full = ((g.total_shape[0], zt, g.total_shape[1])
                if self._perm is not None else g.total_shape)
        inter = ((g.Nx, zt, g.Ny) if self._perm is not None
                 else (g.Nx, g.Ny, zt))
        if full == inter:
            return state

        def c(a):
            if getattr(a, "ndim", 0) != 3:
                return a
            if self.fused_advance and tuple(a.shape) == full:
                return a[self._int_cut()]
            if not self.fused_advance and tuple(a.shape) == inter:
                return jnp.pad(a, self._int_pad())
            return a
        return dict(state, G_prev={n: c(v) for n, v in gp.items()})

    def initial_state(self, clock=None, eta=0.0, **values):
        from ..fields.field import new_field, set_field
        g = self.grid
        sol = {}
        locs = self._locs()
        for name in self.prognostic_names():
            f = new_field(g, locs[name], self.bcs[name])
            sol[name] = set_field(f, g, values.get(name, 0.0)).data
        eta_arr = jnp.zeros(g.total_shape[:2] + (1,), g.dtype)
        if callable(eta):
            x, y, _ = g.nodes(ETA_LOC, with_halo=True)
            eta_arr = jnp.broadcast_to(
                jnp.asarray(eta(x[:, :, :1], y[:, :, :1]), g.dtype), eta_arr.shape)
        else:
            eta_arr = eta_arr + eta
        eta_arr = fill2d(eta_arr, g, ETA_LOC, self.eta_bcs)
        clock = clock or Clock(jnp.zeros((), g.dtype), jnp.zeros((), jnp.int32))
        if self._perm is not None:
            from ..ops.permuted import permute
            sol = {k: permute(v, self._perm) for k, v in sol.items()}
        zeros = {k: jnp.zeros_like(v) for k, v in sol.items()}
        if self.fused_advance:
            cut = self._int_cut()
            zeros = {k: v[cut] for k, v in zeros.items()}
        if self._explicit_fs:
            zeros["eta"] = jnp.zeros_like(eta_arr)
        state = dict(solution=sol, eta=eta_arr, clock=clock, G_prev=zeros,
                     previous_dt=jnp.full((), -1.0, g.dtype))
        if self.particles is not None:
            state["particles"] = self.particles
        return self.update_state(state)

    def fill_all_halos(self, sol, t=0.0):
        locs = self._locs()
        return {name: fill_halos(arr, self.grid, locs[name], self.bcs[name],
                                 t, perm=self._perm)
                for name, arr in sol.items()}

    def compute_w(self, sol, axes=(0, 1, 2)):
        """w from continuity, integrated bottom-up
        (reference compute_w_from_continuity.jl:30-36). ``axes``
        restricts the final halo fill (the overlap bulk pass fills only
        the uncut axes, so no collectives are issued). Runs in the
        model's state layout: under (x, z, y) the divergence uses the
        permuted stencils/metrics and the integral is a plain cumsum —
        z sits in the cheap sublane dimension there."""
        g = self.grid
        Hz, Nz = g.Hz, g.Nz
        perm = self._perm
        if perm is not None:
            from ..ops import stencil as st_
            from ..ops.permuted import PermutedGrid
            gp = PermutedGrid(g, perm)
            zax = perm[2]
            with st_.axis_permutation(perm):
                d = op.div_xy_ccc(sol["u"], sol["v"], gp)
                incr = jnp.broadcast_to(gp.dz(CENTER), d.shape) * d
            sl = [slice(None)] * 3
            sl[zax] = slice(Hz, Hz + Nz)
            cum = jnp.cumsum(incr[tuple(sl)], axis=zax)
            # physical shape derived from perm (physical axis p holds
            # logical axis perm.index(p)); for XZY this is (x, z, y)
            w = jnp.zeros(tuple(g.total_shape[perm.index(p)]
                                for p in range(3)), g.dtype)
            wsl = [slice(None)] * 3
            wsl[zax] = slice(Hz + 1, Hz + Nz + 1)
            w = w.at[tuple(wsl)].set(-cum)
            return fill_halos(w, g, W_LOC, self.w_bcs, axes=axes, perm=perm)
        d = op.div_xy_ccc(sol["u"], sol["v"], g)          # (X,Y,Z) at centers
        incr = (jnp.broadcast_to(g.dz(CENTER), d.shape) * d)[:, :, Hz:Hz + Nz]
        if jax.default_backend() == "tpu" and Nz > 1:
            # cumulative sum as a triangular matmul — rides the MXU
            # instead of a log-depth scan (same trick as the pHY′
            # integral, buoyancy.py hydrostatic_pressure_anomaly)
            L = jnp.tril(jnp.ones((Nz, Nz), incr.dtype)).T  # L[j,k]=1, j≤k
            cum = jax.lax.dot_general(incr, L, (((2,), (0,)), ((), ())),
                                      preferred_element_type=incr.dtype)
        else:
            cum = jnp.cumsum(incr, axis=2)                 # ∫ up through cell k
        w = jnp.zeros(g.total_shape, g.dtype)
        # face k+1 (array index Hz+1+k) = −cumsum through cell k; face Hz = 0
        w = w.at[:, :, Hz + 1: Hz + Nz + 1].set(-cum)
        return fill_halos(w, g, W_LOC, self.w_bcs, axes=axes)

    def update_state(self, state):
        """Halo fills + masking + diagnosed w/aux. Under ``halo_overlap``
        (set by DistributedModel) the exchanges and aux recomputation are
        DEFERRED into the next step's ``tendencies_overlapped``; the
        communication-free parts run now so interiors stay bit-identical
        to the plain step's (local-axis fills, cut-axis wall faces,
        pointwise immersed masking). The carried w/diffusivities/pHY′ lag
        one step and are rebuilt from the exchanged solution there."""
        if getattr(self, "halo_overlap", False):
            from ..boundary_conditions.bcs import impose_cut_wall_faces
            t = state["clock"].time
            locs = self._locs()
            dist = getattr(self.grid, "dist", (None, None, None))
            local_axes = tuple(a for a in (0, 1, 2) if dist[a] is None)
            sol = {name: impose_cut_wall_faces(
                       fill_halos(arr, self.grid, locs[name],
                                  self.bcs[name], t, axes=local_axes),
                       self.grid, locs[name], self.bcs[name], t)
                   for name, arr in state["solution"].items()}
            state = dict(state, solution=sol)
            if self.immersed_boundary is not None:
                state = self.immersed_boundary.mask_state(self, state)
            return state
        t = state["clock"].time
        sol = self.fill_all_halos(state["solution"], t)
        eta = fill2d(state["eta"], self.grid, ETA_LOC, self.eta_bcs, t)
        state = dict(state, solution=sol, eta=eta)
        if self.immersed_boundary is not None:
            state = self.immersed_boundary.mask_state(self, state)
            sol = state["solution"]
        if self.wphy_in_kernel:
            # w and pHY′ are rebuilt inside the fused tendency kernel
            # from this (filled, masked) solution every step — the state
            # carries neither, and diagnostics recompute on demand
            return state
        state = dict(state, w=self.compute_w(sol))
        tr = {n: sol[n] for n in self.tracer_names}
        diff = compute_closure_diffusivities(
            self.closure, self.grid, dict(sol, w=state["w"]), self.buoyancy, tr)
        if diff is not None:
            state = dict(state, diffusivities=diff)
        if self.buoyancy is not None:
            tr = {n: sol[n] for n in self.tracer_names}
            ph = hydrostatic_pressure_anomaly(self.buoyancy, self.grid, tr,
                                              perm=self._perm)
            ph = fill_halos(ph, self.grid, CENTER, self.pressure_bcs, t,
                            perm=self._perm)
            state = dict(state, pHY=ph)
        return state

    def tendencies_overlapped(self, state):
        """Interior/edge-split tendencies for distributed runs — the
        hydrostatic counterpart of NonhydrostaticModel.tendencies_overlapped
        (reference halo_communication.jl:68-86 nonblocking Isend/Irecv +
        interior-kernel overlap):

        1. issue the halo-exchange ppermutes (full fills) and rebuild the
           deferred ``update_state`` products (mask, w, diffusivities,
           pHY′) from the exchanged solution;
        2. compute the FULL tendency field from the stale-cut-halo
           solution (local fills + local-fill diagnosed w only — no
           dependency on the exchange, so XLA runs the collectives
           concurrently with this bulk pass);
        3. recompute the H-wide interior strips along each cut axis from
           the exchanged solution on sliced sub-grids and patch them in.

        Returns ``(G, state_fresh)``. The step's downstream consumers
        (barotropic mode, free-surface solves) read ``state_fresh``.
        Between steps the carried w/diffusivities/pHY′ lag one exchange
        (recomputed here), matching the deferred-update contract."""
        import copy as _copy
        grid = self.grid
        t = state["clock"].time
        sol_stale = state["solution"]
        # fresh path: the deferred update_state (exchange + mask + aux)
        sol_fresh = self.fill_all_halos(sol_stale, t)
        eta_fresh = fill2d(state["eta"], grid, ETA_LOC, self.eta_bcs, t)
        state_fresh = dict(state, solution=sol_fresh, eta=eta_fresh)
        if self.immersed_boundary is not None:
            state_fresh = self.immersed_boundary.mask_state(self, state_fresh)
            sol_fresh = state_fresh["solution"]
        state_fresh = dict(state_fresh, w=self.compute_w(sol_fresh))
        tr = {n: sol_fresh[n] for n in self.tracer_names}
        diff = compute_closure_diffusivities(
            self.closure, grid, dict(sol_fresh, w=state_fresh["w"]),
            self.buoyancy, tr)
        if diff is not None:
            state_fresh = dict(state_fresh, diffusivities=diff)
        if self.buoyancy is not None:
            ph = hydrostatic_pressure_anomaly(self.buoyancy, grid, tr)
            ph = fill_halos(ph, grid, CENTER, self.pressure_bcs, t)
            state_fresh = dict(state_fresh, pHY=ph)
        # bulk pass: LOCAL fills only (uncut axes — no collectives);
        # w diagnosed from the locally-filled solution is exact for every
        # interior cell further than H from a cut-axis shard edge
        local_axes = tuple(a for a in (0, 1, 2) if grid.dist[a] is None)
        locs = self._locs()
        sol_local = {name: fill_halos(arr, grid, locs[name], self.bcs[name],
                                      t, axes=local_axes)
                     for name, arr in sol_stale.items()}
        if self.immersed_boundary is not None:
            sol_local = self.immersed_boundary.mask_state(
                self, dict(state, solution=sol_local))["solution"]
        w_local = self.compute_w(sol_local, axes=local_axes)
        G = self.tendencies(dict(state_fresh, solution=sol_local,
                                 w=w_local))

        def _slc3(x, axis, start, size):
            if getattr(x, "ndim", 0) == 3:
                sl = [slice(None)] * 3
                sl[axis] = slice(start, min(start + size, x.shape[axis]))
                return x[tuple(sl)]
            return x

        for axis in (0, 1):
            if grid.dist[axis] is None:
                continue
            H = grid.halo[axis]
            N = grid.shape[axis]
            for start_int in (0, N - H):  # first/last H interior cells
                gsub = grid.subgrid_along(axis, start_int, H)
                ms = _copy.copy(self)
                ms.grid = gsub
                ms.fused_advection = False  # strips are tiny; jnp path
                if self.immersed_boundary is not None:
                    ms.immersed_boundary = gsub.immersed
                sub = {k: (jax.tree_util.tree_map(
                           lambda x: _slc3(x, axis, start_int, 3 * H), v)
                           if k in ("solution", "diffusivities", "pHY",
                                    "w", "eta")
                           else v)
                       for k, v in state_fresh.items() if k != "particles"}
                Gs = ms.tendencies(sub)
                sl = [slice(None)] * 3
                sl[axis] = slice(start_int + H, start_int + 2 * H)
                ssl = [slice(None)] * 3
                ssl[axis] = slice(H, 2 * H)
                G = {name: G[name].at[tuple(sl)].set(Gs[name][tuple(ssl)])
                     for name in G}
        return G, state_fresh

    # -- tendencies -------------------------------------------------------------
    def tendencies(self, state):
        grid = self.grid
        sol = state["solution"]
        u, v = sol["u"], sol["v"]
        w = state.get("w")
        if w is None and not self.wphy_in_kernel:
            w = self.compute_w(sol)
        clock = state["clock"]
        fs = self.free_surface
        tr = {n: sol[n] for n in self.tracer_names}
        ph = (state["pHY"] if self.buoyancy is not None and "pHY" in state
              else None)

        from ..ops.fused_hydrostatic import (fused_hydrostatic_tendencies,
                                             hydrostatic_advective_core,
                                             kernel_closure)
        ker_cl = None
        if (self.fused_advection
                and getattr(grid, "dist", (None,) * 3) == (None, None, None)):
            # ONE Pallas pass: advection + Coriolis + ∂pHY′ — and the
            # explicit part of a constant-coefficient ScalarDiffusivity —
            # for every prognostic field; other closures/forcings/BC
            # fluxes are added below
            ker_cl = kernel_closure(self)
            G = fused_hydrostatic_tendencies(self, state)
        else:
            G = hydrostatic_advective_core(grid, self.momentum_advection,
                                           self.tracer_advection,
                                           self.coriolis, self.tracer_names,
                                           u, v, w, tr, pHY=ph)
        Gu, Gv = G["u"], G["v"]

        if self._explicit_fs:
            g_const = fs.gravitational_acceleration
            gex = g_const * grad_x(grid, state["eta"])   # (X, Y, 1)
            gey = g_const * grad_y(grid, state["eta"])
            if self._perm is not None:
                gex = jnp.transpose(gex, self._perm)
                gey = jnp.transpose(gey, self._perm)
            Gu = Gu - gex
            Gv = Gv - gey

        diff = state.get("diffusivities")
        if self.closure is not None and ker_cl is None:
            Gu = Gu + momentum_diffusion(u, grid, U_LOC, self.closure, diff)
            Gv = Gv + momentum_diffusion(v, grid, V_LOC, self.closure, diff)

        G["u"], G["v"] = Gu, Gv

        for name in self.tracer_names:
            c = sol[name]
            Gc = G[name]
            if self.closure is not None and ker_cl is None:
                Gc = Gc + tracer_diffusion(c, grid, name, self.closure, diff)
                closures = (self.closure if isinstance(self.closure, (tuple, list))
                            else (self.closure,))
                diffs = diff if isinstance(self.closure, (tuple, list)) else (diff,)
                for cl, d in zip(closures, diffs or (None,) * len(closures)):
                    if name == "e" and hasattr(cl, "tke_tendency"):
                        trd = {n: sol[n] for n in self.tracer_names}
                        Gc = Gc + cl.tke_tendency(grid, dict(sol, w=w), d, trd)
            G[name] = Gc

        if w is None and any(
                bc is not None and bc.discrete
                for bcs in self.bcs.values() for _a, _s, bc in bcs.sides()):
            # wphy_in_kernel carries no w in the state, but discrete-form
            # (field-dependent) flux BCs may read fields["w"] — rebuild it
            # on demand (only traced for configs that actually need it)
            w = self.compute_w(sol)
        fields = dict(sol, w=w, eta=state["eta"])
        locs = self._locs()
        for name in self.prognostic_names():
            if name in self.forcing:
                G[name] = G[name] + self.forcing[name](grid, clock, fields)
            G[name] = apply_flux_bcs(G[name], grid, locs[name],
                                     self.bcs[name], clock.time, fields)
            if self.immersed_boundary is not None:
                G[name] = apply_immersed_flux_bcs(G[name], grid, locs[name],
                                                  self.bcs[name], clock.time,
                                                  fields)
        if self.immersed_boundary is not None:
            G = {k: self.immersed_boundary.mask_tendency(self, k, g_arr)
                 for k, g_arr in G.items()}
        return G

    # -- stepping ---------------------------------------------------------------
    def _coerce_layout(self, state):
        """Convert cross-layout state (e.g. a checkpoint written on a
        backend with the other state layout) into this model's layout.
        Ambiguous when Yt == Zt — then the state is assumed correct."""
        xt, yt, zt = self.grid.total_shape
        u = state["solution"]["u"]
        if yt == zt or u.ndim != 3:
            return state
        from ..ops.permuted import permute, unpermute
        want = (xt, zt, yt) if self._perm is not None else (xt, yt, zt)
        other = (xt, yt, zt) if self._perm is not None else (xt, zt, yt)
        if tuple(u.shape) == want:
            return state
        conv = permute if self._perm is not None else unpermute

        def c(a):
            return (conv(a) if getattr(a, "ndim", 0) == 3
                    and tuple(a.shape) == other else a)
        out = dict(state)
        for k in ("solution", "G_prev"):
            if k in out and isinstance(out[k], dict):
                out[k] = {n: c(v) for n, v in out[k].items()}
        for k in ("w", "pHY"):
            if k in out:
                out[k] = c(out[k])
        return out

    def step(self, state, dt):
        """Quasi-AB2 with the free-surface family split out (reference
        hydrostatic_free_surface_ab2_step.jl:14-27)."""
        grid = self.grid
        fs = self.free_surface
        state = self._coerce_layout(state)
        state = self._coerce_gprev(state)
        clock0 = state["clock"]
        euler = (clock0.iteration == 0) | (jnp.abs(state["previous_dt"] - dt) > 1e-14)
        chi = jnp.where(euler, -0.5, self.ab2_chi)

        from ..closures.implicit_vertical_diffusion import implicit_step_is_noop
        fadv = self.fused_advance and not getattr(self, "halo_overlap", False)
        # interior fast lane (split-explicit only): when the implicit
        # solve is a no-op, u/v stay as fused-kernel x/y-interiors
        # through the barotropic corrector and are padded ONCE after it —
        # skips the pad→full-corrector round trip (~0.6 GB/step at ¼°)
        int_corr = (fadv and isinstance(fs, SplitExplicitFreeSurface)
                    and implicit_step_is_noop(self.closure))
        if getattr(self, "halo_overlap", False):
            G, state = self.tendencies_overlapped(state)
        elif fadv:
            # ONE Pallas pass computes G AND the AB2 substep (ψ′, G as
            # x/y-interior arrays in the state layout); ψ′ is padded back
            # to halo shape (the zero halos are refilled by update_state
            # before any read), G stays interior as next step's G_prev
            from ..ops.fused_hydrostatic import fused_hydrostatic_tendencies
            stepped_f, G = fused_hydrostatic_tendencies(
                self, state, advance=(dt, euler))
            if not int_corr:
                stepped_f = {n: jnp.pad(a, self._int_pad())
                             for n, a in stepped_f.items()}
        else:
            G = self.tendencies(state)
        G_prev = state["G_prev"]

        if self._explicit_fs:
            U, V = barotropic_mode(grid, state["solution"]["u"],
                                   state["solution"]["v"], perm=self._perm)
            G["eta"] = -div_xy_2d(grid, U, V)
            sol_all = dict(state["solution"], eta=state["eta"])
            stepped = ab2_substep(sol_all, G, G_prev, dt, self.ab2_chi, euler)
            eta = stepped.pop("eta")
            sol = implicit_step_fields(stepped, grid, self._locs(), self.closure,
                                       dt, state.get("diffusivities"),
                                       self.bcs, clock0.time)
            new_state = dict(state, solution=sol, eta=eta, G_prev=G)

        elif isinstance(fs, SplitExplicitFreeSurface):
            # barotropic mode of uⁿ (before the baroclinic step)
            U0, V0 = barotropic_mode(grid, state["solution"]["u"],
                                     state["solution"]["v"], perm=self._perm)
            # combined AB2 tendencies for the barotropic forcing
            c1, c2 = 1.5 + chi, 0.5 + chi
            GU, _ = barotropic_mode(grid, c1 * G["u"] - c2 * G_prev["u"],
                                    c1 * G["v"] - c2 * G_prev["v"],
                                    perm=self._perm)
            _, GV = barotropic_mode(grid, c1 * G["u"] - c2 * G_prev["u"],
                                    c1 * G["v"] - c2 * G_prev["v"],
                                    perm=self._perm)
            if fadv:
                # interior G/G⁻ → interior (GU, GV), zero-padded to the
                # (X, Y, 1) halo shape (substep_eta refills U/V halos
                # every substep, so zero GU/GV halos are exact)
                pad2 = ((grid.Hx, grid.Hx), (grid.Hy, grid.Hy), (0, 0))
                GU, GV = jnp.pad(GU, pad2), jnp.pad(GV, pad2)
                stepped = stepped_f
            else:
                stepped = ab2_substep(state["solution"], G, G_prev, dt,
                                      self.ab2_chi, euler)
            eta, U_av, V_av = fs.substep_eta(grid, self.eta_bcs, state["eta"],
                                             GU, GV, U0, V0, dt)
            if int_corr:
                # u/v are still kernel interiors; correct them in place
                # and pad once (implicit solve is a no-op — gated above)
                u, v = fs.corrector_interior(grid, stepped["u"], stepped["v"],
                                             U_av, V_av, perm=self._perm)
                pad = self._int_pad()
                sol = {n: jnp.pad(a, pad) for n, a in stepped.items()
                       if n not in ("u", "v")}
                sol["u"], sol["v"] = jnp.pad(u, pad), jnp.pad(v, pad)
            else:
                sol = implicit_step_fields(stepped, grid, self._locs(),
                                           self.closure, dt,
                                           state.get("diffusivities"),
                                           self.bcs, clock0.time)
                u, v = fs.corrector(grid, sol["u"], sol["v"], U_av, V_av,
                                    perm=self._perm)
                sol = dict(sol, u=u, v=v)
            new_state = dict(state, solution=sol, eta=eta, G_prev=G)

        else:  # ImplicitFreeSurface
            stepped = (stepped_f if fadv else
                       ab2_substep(state["solution"], G, G_prev, dt,
                                   self.ab2_chi, euler))
            sol = implicit_step_fields(stepped, grid, self._locs(), self.closure,
                                       dt, state.get("diffusivities"),
                                       self.bcs, clock0.time)
            sol = self.fill_all_halos(sol, clock0.time)
            Qu, Qv = barotropic_mode(grid, sol["u"], sol["v"], perm=self._perm)
            g_const = fs.gravitational_acceleration
            rhs = (div_xy_2d(grid, Qu, Qv) - state["eta"] / dt) / (g_const * dt)
            eta = fs.solve(grid, self.eta_bcs, rhs, state["eta"], dt)
            gx = g_const * dt * grad_x(grid, eta)
            gy = g_const * dt * grad_y(grid, eta)
            if self._perm is not None:
                gx = jnp.transpose(gx, self._perm)
                gy = jnp.transpose(gy, self._perm)
            sol = dict(sol, u=sol["u"] - gx, v=sol["v"] - gy)
            new_state = dict(state, solution=sol, eta=eta, G_prev=G)

        clock = clock0.tick(dt)
        new_state = dict(new_state, clock=clock,
                         previous_dt=jnp.full((), 1.0, grid.dtype) * dt)
        new_state = self.update_state(new_state)
        p = new_state.get("particles")
        if p is not None:
            # advect particles in the updated (u, v, diagnosed-w) field
            # (reference update_particle_properties! inside time_step!)
            sol = new_state["solution"]
            vels = dict(u=sol["u"], v=sol["v"], w=new_state["w"])
            fields = {nm: sol[nm] for nm in self.tracer_names}
            new_state = dict(new_state,
                             particles=p.step(grid, vels, dt, fields))
        return new_state

    # -- diagnostics ---------------------------------------------------------------
    def cell_diffusion_timescale(self, state):
        """min Δ²/max(ν, κ) over this model's closures (reference
        turbulence_closure_diagnostics.jl); +inf when nothing limits."""
        from ..closures.scalar_diffusivity import cell_diffusion_timescale
        return cell_diffusion_timescale(self.closure, self.grid,
                                        state.get("diffusivities"),
                                        self.tracer_names)

    def cell_advection_timescale(self, state):
        sol = state["solution"]
        grid = self.grid
        if state.get("w") is None:   # wphy_in_kernel: rebuild on demand
            state = dict(state, w=self.compute_w(sol))
        if self._perm is not None:   # diagnostics run in natural layout
            from ..ops.permuted import unpermute
            sol = {k: unpermute(v, self._perm) for k, v in sol.items()}
            state = dict(state, w=unpermute(state["w"], self._perm))
        scales = []
        vels = (("u", U_LOC, 0), ("v", V_LOC, 1))
        for name, loc, axis in vels:
            if grid.topology[axis] is FLAT:
                continue
            sp = grid.spacing(axis, loc)
            val = grid.interior(jnp.broadcast_to(
                sp / jnp.maximum(jnp.abs(sol[name]), 1e-30), grid.total_shape))
            scales.append(jnp.min(val))
        w = state.get("w")
        if w is not None and grid.topology[2] is not FLAT:
            sp = grid.spacing(2, W_LOC)
            val = grid.interior(jnp.broadcast_to(
                sp / jnp.maximum(jnp.abs(w), 1e-30), grid.total_shape))
            scales.append(jnp.min(val))
        return jnp.min(jnp.stack(scales))

    def fields(self, state):
        locs = self._locs()
        perm = self._perm
        if perm is not None:
            from ..ops.permuted import unpermute
            up = lambda a: unpermute(a, perm)
        else:
            up = lambda a: a
        out = {name: Field(up(arr), locs[name], self.bcs[name])
               for name, arr in state["solution"].items()}
        w = state.get("w")
        if w is None:   # wphy_in_kernel: rebuild on demand
            w = self.compute_w(state["solution"])
        out["w"] = Field(up(w), W_LOC, self.w_bcs)
        out["eta"] = Field(state["eta"], ETA_LOC, self.eta_bcs)
        return out
