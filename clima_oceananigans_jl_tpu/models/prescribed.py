"""Prescribed-velocity (tracer-only) model mode.

Port of /root/reference/src/Models/HydrostaticFreeSurfaceModels/
prescribed_hydrostatic_velocity_fields.jl: velocities are fixed analytic
functions (or arrays) of space and time; only tracers are prognostic —
used for advection tests, offline transport, and calibration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..advection.fluxes import div_Uc
from ..advection.schemes import CenteredSecondOrder
from ..boundary_conditions.bcs import apply_flux_bcs, fill_halos, regularize_bcs
from ..closures.scalar_diffusivity import tracer_diffusion
from ..fields.field import Field
from ..timesteppers.steppers import Clock, ab2_substep
from ..utils.location import CENTER, U_LOC, V_LOC, W_LOC


class PrescribedVelocityFields:
    """u/v/w as callables f(x, y, z, t) or constant arrays/scalars."""

    def __init__(self, u=0.0, v=0.0, w=0.0):
        self.u, self.v, self.w = u, v, w

    def evaluate(self, grid, t):
        out = []
        for q, loc in ((self.u, U_LOC), (self.v, V_LOC), (self.w, W_LOC)):
            if callable(q):
                x, y, z = grid.nodes(loc, with_halo=True)
                arr = jnp.broadcast_to(jnp.asarray(q(x, y, z, t), grid.dtype),
                                       grid.total_shape)
            else:
                arr = jnp.broadcast_to(jnp.asarray(q, grid.dtype),
                                       grid.total_shape)
            out.append(arr)
        return tuple(out)


@jax.tree_util.register_pytree_node_class
class PrescribedVelocityModel:
    """AB2 tracer transport under prescribed velocities."""

    def __init__(self, grid, velocities, tracers=("c",),
                 tracer_advection=None, closure=None, forcing=None,
                 boundary_conditions=None):
        self.velocities = velocities
        self.tracer_advection = (tracer_advection if tracer_advection is not None
                                 else CenteredSecondOrder())
        h = max(self.tracer_advection.required_halo, 1)
        self.grid = grid.with_halo((h, h, h))
        self.tracer_names = tuple(tracers)
        self.closure = closure
        from ..forcings.forcing import regularize_forcing
        self.forcing = {k: regularize_forcing(k, v)
                        for k, v in (forcing or {}).items()}
        self.ab2_chi = 0.1
        user_bcs = boundary_conditions or {}
        self.bcs = {n: regularize_bcs(self.grid, CENTER, user_bcs.get(n))
                    for n in self.tracer_names}

    def tree_flatten(self):
        return ((self.grid, self.closure, self.bcs),
                (self.velocities, self.tracer_advection, self.tracer_names,
                 tuple(sorted(self.forcing)),
                 tuple(self.forcing[k] for k in sorted(self.forcing))))

    @classmethod
    def tree_unflatten(cls, static, leaves):
        obj = object.__new__(cls)
        obj.grid, obj.closure, obj.bcs = leaves
        (obj.velocities, obj.tracer_advection, obj.tracer_names, fk, fv) = static
        obj.forcing = dict(zip(fk, fv))
        obj.ab2_chi = 0.1
        return obj

    def prognostic_names(self):
        return self.tracer_names

    def _locs(self):
        return {n: CENTER for n in self.tracer_names}

    def initial_state(self, clock=None, **values):
        from ..fields.field import new_field, set_field
        g = self.grid
        sol = {}
        for name in self.tracer_names:
            f = new_field(g, CENTER, self.bcs[name])
            sol[name] = set_field(f, g, values.get(name, 0.0)).data
        clock = clock or Clock(jnp.zeros((), g.dtype), jnp.zeros((), jnp.int32))
        zeros = {k: jnp.zeros_like(v) for k, v in sol.items()}
        return dict(solution=sol, clock=clock, G_prev=zeros,
                    previous_dt=jnp.full((), -1.0, g.dtype))

    def tendencies(self, state):
        grid = self.grid
        clock = state["clock"]
        u, v, w = self.velocities.evaluate(grid, clock.time)
        sol = state["solution"]
        G = {}
        for name in self.tracer_names:
            c = fill_halos(sol[name], grid, CENTER, self.bcs[name], clock.time)
            Gc = -div_Uc(grid, self.tracer_advection, u, v, w, c)
            if self.closure is not None:
                Gc = Gc + tracer_diffusion(c, grid, name, self.closure)
            if name in self.forcing:
                Gc = Gc + self.forcing[name](grid, clock, dict(sol, u=u, v=v, w=w))
            G[name] = apply_flux_bcs(Gc, grid, CENTER, self.bcs[name], clock.time)
        return G

    def step(self, state, dt):
        clock0 = state["clock"]
        euler = (clock0.iteration == 0) | (jnp.abs(state["previous_dt"] - dt) > 1e-14)
        G = self.tendencies(state)
        sol = ab2_substep(state["solution"], G, state["G_prev"], dt,
                          self.ab2_chi, euler)
        sol = {n: fill_halos(arr, self.grid, CENTER, self.bcs[n],
                             clock0.time + dt)
               for n, arr in sol.items()}
        return dict(state, solution=sol, clock=clock0.tick(dt), G_prev=G,
                    previous_dt=jnp.full((), 1.0, self.grid.dtype) * dt)

    def fields(self, state):
        return {n: Field(arr, CENTER, self.bcs[n])
                for n, arr in state["solution"].items()}
