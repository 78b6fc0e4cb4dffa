"""Hydrostatic free-surface model on the cubed sphere.

The analog of the reference's HydrostaticFreeSurfaceModel on a
ConformalCubedSphereGrid (/root/reference/src/CubedSpheres/CubedSpheres.jl:17-36
hooks the model's halo filling / kernel launching onto the 6-face grid).
Here the whole model state lives on the (6, X, Y, Z) batch layout:
tendencies are one ``vmap`` over faces of the standard per-face stencils
(vector-invariant momentum, WENO/centered tracer advection, spherical
Coriolis with f at vorticity points from the faces' true latitudes), and
the inter-face exchange (exact rotated index copies,
grids/cubed_sphere.py) replaces fill_halo_regions!.

Prognostic: u, v (face-tangent velocities, 3D), tracers (3D), η (2D);
w is diagnosed from continuity; the free surface is stepped explicitly
(∂t η = −∇·∫u dz), the reference's ExplicitFreeSurface on the sphere.
Time stepping: RK3.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..advection.schemes import CenteredSecondOrder
from ..advection.vector_invariant import VectorInvariant
from ..ops import stencil as st
from ..timesteppers.steppers import Clock, RK3_GAMMA, RK3_ZETA
from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC


@jax.tree_util.register_pytree_node_class
class CubedSphereHydrostaticModel:
    """Config container; pure-function step over the (6,X,Y,Z) state."""

    def __init__(self, grid, momentum_advection=None, tracer_advection=None,
                 coriolis_rotation_rate=7.292115e-5, buoyancy=None,
                 gravitational_acceleration=9.80665, closure=None,
                 tracers=(), depth=None, prescribed_velocities=False):
        """``depth``: barotropic layer depth for flat-z (Nz=1) grids
        (defaults to the z-axis extent). ``prescribed_velocities``: hold
        u, v, η fixed and step only the tracers — the reference's
        PrescribedVelocityFields on the cubed sphere
        (validation/cubed_sphere_tracer_advection)."""
        self.prescribed_velocities = bool(prescribed_velocities)
        self.grid = grid
        self.depth = float(depth) if depth is not None else None
        self.momentum_advection = (momentum_advection
                                   if momentum_advection is not None
                                   else VectorInvariant())
        self.tracer_advection = (tracer_advection if tracer_advection is not None
                                 else CenteredSecondOrder())
        self.g = float(gravitational_acceleration)
        self.buoyancy = buoyancy
        self.closure = closure
        names = list(tracers)
        if buoyancy is not None:
            for t in buoyancy.required_tracers:
                if t not in names:
                    names.append(t)
        self.tracer_names = tuple(names)
        # Coriolis f = 2Ω sin φ at vorticity points (F,F) per face,
        # from the faces' true latitudes (numerically exact geometry)
        lat_ff = np.stack([
            np.degrees(np.arcsin(np.clip(
                grid._nodes(f, (F, F))[..., 2] /
                np.linalg.norm(grid._nodes(f, (F, F)), axis=-1), -1, 1)))
            for f in range(6)])
        self.f_ff = jnp.asarray(
            2.0 * coriolis_rotation_rate
            * np.sin(np.radians(lat_ff))[..., None], grid.dtype)

    def tree_flatten(self):
        return ((self.f_ff, self.buoyancy, self.closure),
                (self.grid, self.momentum_advection, self.tracer_advection,
                 self.g, self.tracer_names, self.depth,
                 self.prescribed_velocities))

    @classmethod
    def tree_unflatten(cls, static, leaves):
        obj = object.__new__(cls)
        obj.f_ff, obj.buoyancy, obj.closure = leaves
        (obj.grid, obj.momentum_advection, obj.tracer_advection,
         obj.g, obj.tracer_names, obj.depth,
         obj.prescribed_velocities) = static
        return obj

    # -- state -----------------------------------------------------------------
    def prognostic_names(self):
        return ("u", "v") + self.tracer_names

    def initial_state(self, u=None, v=None, eta=0.0, clock=None, **tracers):
        """u/v: callables p3d -> value (projected on face tangents) or
        (6,X,Y,Z) arrays; eta: callable p3d -> value or scalar."""
        g = self.grid
        N, H = g.N, g.H
        shp = g.total_shape

        def vec_component(fn, loc2, axis):
            if fn is None:
                return jnp.zeros(shp, g.dtype)
            out = np.zeros(shp[:3])
            for f in range(6):
                xs = g._lattice_1d(loc2[0])
                ys = g._lattice_1d(loc2[1])
                X, Y = np.meshgrid(xs, ys, indexing="ij")
                pts = g._nodes(f, loc2)
                t = g._tangent(f, np.clip(X, -1, 1), np.clip(Y, -1, 1), axis)
                out[f] = (np.asarray(fn(pts)) * t).sum(-1)
            return jnp.asarray(out[..., None] * np.ones(shp[3:]), g.dtype)

        sol = {}
        if callable(u) or callable(v):
            vf = u if callable(u) else (lambda p: np.zeros(p.shape[:-1] + (3,)))
            sol["u"] = vec_component(vf, (F, C), 0)
            sol["v"] = vec_component(vf, (C, F), 1)
        else:
            sol["u"] = jnp.zeros(shp, g.dtype) if u is None else jnp.asarray(u)
            sol["v"] = jnp.zeros(shp, g.dtype) if v is None else jnp.asarray(v)
        for n in self.tracer_names:
            val = tracers.get(n, 0.0)
            if callable(val):
                pts = np.stack([g._nodes(f, (C, C)) for f in range(6)])
                # centers at each z level share horizontal position
                arr = np.asarray(val(pts))[..., None] * np.ones(shp[3:])
                sol[n] = jnp.asarray(arr, g.dtype)
            else:
                sol[n] = jnp.full(shp, val, g.dtype)
        if callable(eta):
            pts = np.stack([g._nodes(f, (C, C)) for f in range(6)])
            eta_arr = jnp.asarray(np.asarray(eta(pts))[..., None], g.dtype)
        else:
            eta_arr = jnp.full(shp[:3] + (1,), eta, g.dtype)
        clock = clock or Clock(jnp.zeros((), g.dtype), jnp.zeros((), jnp.int32))
        return dict(solution=sol, eta=eta_arr, clock=clock)

    # -- halo exchange ----------------------------------------------------------
    def exchange(self, state):
        g = self.grid
        sol = dict(state["solution"])
        sol["u"], sol["v"] = g.fill_halos(sol["u"], vector_pair=(sol["u"], sol["v"]))
        for n in self.tracer_names:
            sol[n] = g.fill_halos(sol[n])
        eta = g.fill_halos(state["eta"])
        return dict(state, solution=sol, eta=eta)

    # -- physics ----------------------------------------------------------------
    def _face_tendencies(self, fg, f_ff, u, v, eta, tracers):
        """Per-face tendencies (vmapped over the leading face axis)."""
        zt = u.shape[-1]
        Hz, Nz = fg.Hz, fg.Nz
        # w from continuity (bottom-up integral of -divergence)
        div_h = (st.dxc(fg.Ay(U_LOC) * u) + st.dyc(fg.Ax(V_LOC) * v)) / fg.Az(CENTER)
        if Nz > 1:
            dz = jnp.broadcast_to(fg.dz(CENTER), div_h.shape)
            s = jnp.cumsum((div_h * dz)[:, :, Hz:Hz + Nz], axis=2)
            w = jnp.zeros_like(u)
            w = w.at[:, :, Hz + 1:Hz + Nz + 1].set(-s)
        else:
            w = jnp.zeros_like(u)

        adv = self.momentum_advection
        Gu = -adv.U_dot_grad_u(fg, u, v, w)
        Gv = -adv.U_dot_grad_v(fg, u, v, w)
        # spherical coriolis, energy-conserving form with f at (F,F)
        dx_v = fg.dx((C, F, C)) * v
        dy_u = fg.dy((F, C, C)) * u
        Gu = Gu + st.iyc(f_ff * st.ixf(dx_v)) / fg.dx(U_LOC)
        Gv = Gv - st.ixc(f_ff * st.iyf(dy_u)) / fg.dy(V_LOC)
        # free-surface pressure gradient
        ge = self.g * eta
        Gu = Gu - st.dxf(ge) / fg.dx(U_LOC)
        Gv = Gv - st.dyf(ge) / fg.dy(V_LOC)

        # explicit free surface: ∂t η = −∇·U (vertical integral)
        if Nz > 1:
            dzc = jnp.broadcast_to(fg.dz(U_LOC), u.shape)[:, :, Hz:Hz + Nz]
            U = jnp.sum((u[:, :, Hz:Hz + Nz] * dzc), 2, keepdims=True)
            V = jnp.sum((v[:, :, Hz:Hz + Nz] * dzc), 2, keepdims=True)
        else:
            Hdepth = (self.depth if self.depth is not None
                      else (fg._zaxis.extent if fg._zaxis.extent else 1.0))
            U = u * Hdepth
            V = v * Hdepth
        Geta = -(st.dxc(fg.Ay(U_LOC) * U) + st.dyc(fg.Ax(V_LOC) * V)) / fg.Az(CENTER)

        from ..advection.fluxes import div_Uc
        Gc = {}
        for name, c in tracers.items():
            Gc[name] = -div_Uc(fg, self.tracer_advection, u, v, w, c)
        return Gu, Gv, Geta, Gc

    def tendencies(self, state):
        g = self.grid
        sol = state["solution"]
        tracers = {n: sol[n] for n in self.tracer_names}
        fg = g.face_grids()
        fn = lambda fgrid, f_ff, u, v, eta, tr: self._face_tendencies(
            fgrid, f_ff, u, v, eta, tr)
        Gu, Gv, Geta, Gc = jax.vmap(
            fn, in_axes=(g.face_axes(), 0, 0, 0, 0, 0))(
            fg, self.f_ff, sol["u"], sol["v"], state["eta"], tracers)
        return Gu, Gv, Geta, Gc

    # -- stepping ---------------------------------------------------------------
    def step(self, state, dt):
        """RK3 (reference runge_kutta_3.jl γ/ζ table)."""
        clock0 = state["clock"]
        state = self.exchange(state)
        prev = None
        for gamma, zeta in zip(RK3_GAMMA, RK3_ZETA):
            Gu, Gv, Geta, Gc = self.tendencies(state)
            sol = dict(state["solution"])
            eta = state["eta"]
            if prev is None:
                if not self.prescribed_velocities:
                    sol["u"] = sol["u"] + dt * gamma * Gu
                    sol["v"] = sol["v"] + dt * gamma * Gv
                    eta = eta + dt * gamma * Geta
                for n in self.tracer_names:
                    sol[n] = sol[n] + dt * gamma * Gc[n]
            else:
                pu, pv, pe, pc = prev
                if not self.prescribed_velocities:
                    sol["u"] = sol["u"] + dt * (gamma * Gu + zeta * pu)
                    sol["v"] = sol["v"] + dt * (gamma * Gv + zeta * pv)
                    eta = eta + dt * (gamma * Geta + zeta * pe)
                for n in self.tracer_names:
                    sol[n] = sol[n] + dt * (gamma * Gc[n] + zeta * pc[n])
            prev = (Gu, Gv, Geta, Gc)
            state = self.exchange(dict(state, solution=sol, eta=eta))
        clock = Clock(clock0.time + dt, clock0.iteration + 1, 0)
        return dict(state, clock=clock)
