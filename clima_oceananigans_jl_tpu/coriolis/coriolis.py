"""Coriolis parameterizations.

Array form of /root/reference/src/Coriolis/: each parameterization
provides the staggered cross-product terms
``x_f_cross_U`` at (F,C,C), ``y_f_cross_U`` at (C,F,C),
``z_f_cross_U`` at (C,C,F) (zero for traditional approximations).

Implemented: FPlane (f_plane.jl), BetaPlane (beta_plane.jl),
ConstantCartesianCoriolis (constant_cartesian_coriolis.jl, full 3D
rotation vector), NonTraditionalBetaPlane (non_traditional_beta_plane.jl),
HydrostaticSphericalCoriolis lives with the lat-lon grid support.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import stencil as st
from ..utils.location import C, F, U_LOC, V_LOC, W_LOC


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FPlane:
    """f-plane: f = 2Ω sin(φ) constant (reference f_plane.jl)."""

    f: float = 0.0

    def x_f_cross_U(self, grid, u, v, w):
        return -self.f * st.ixf(st.iyc(v))   # −f v̄ˣʸ at (F,C,C)

    def y_f_cross_U(self, grid, u, v, w):
        return self.f * st.iyf(st.ixc(u))    # +f ūˣʸ at (C,F,C)

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)

    def tree_flatten(self):
        return (self.f,), ()

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BetaPlane:
    """β-plane: f = f₀ + βy (reference beta_plane.jl)."""

    f0: float = 0.0
    beta: float = 0.0

    def _f(self, grid, loc):
        y = grid.nodes(loc, with_halo=True)[1]
        return self.f0 + self.beta * y

    def x_f_cross_U(self, grid, u, v, w):
        return -self._f(grid, U_LOC) * st.ixf(st.iyc(v))

    def y_f_cross_U(self, grid, u, v, w):
        return self._f(grid, V_LOC) * st.iyf(st.ixc(u))

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)

    def tree_flatten(self):
        return (self.f0, self.beta), ()

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ConstantCartesianCoriolis:
    """Full rotation vector fx,fy,fz (reference constant_cartesian_coriolis.jl):
    f⃗ × u⃗ with all three components retained (non-traditional terms)."""

    fx: float = 0.0
    fy: float = 0.0
    fz: float = 0.0

    def x_f_cross_U(self, grid, u, v, w):
        return (self.fy * st.ixf(st.izc(w)) - self.fz * st.ixf(st.iyc(v)))

    def y_f_cross_U(self, grid, u, v, w):
        return (self.fz * st.iyf(st.ixc(u)) - self.fx * st.iyf(st.izc(w)))

    def z_f_cross_U(self, grid, u, v, w):
        return (self.fx * st.izf(st.iyc(v)) - self.fy * st.izf(st.ixc(u)))

    def tree_flatten(self):
        return (self.fx, self.fy, self.fz), ()

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HydrostaticSphericalCoriolis:
    """f = 2Ω sin φ on a lat-lon grid with f at vorticity points (F,F,·)
    (reference hydrostatic_spherical_coriolis.jl). ``scheme`` selects the
    discretization: "energy" (default, f·ℑv averaged together — conserves
    energy under vector-invariant advection, ref :55-65) or "enstrophy"
    (f averaged separately from the doubly-averaged transport, ref
    :41-49 — conserves enstrophy)."""

    rotation_rate: float = 7.292115e-5  # Ω_Earth [s⁻¹]
    scheme: str = "energy"

    def _f_ff(self, grid):
        import numpy as np
        phi_f = grid.nodes((F, F, C), with_halo=True)[1]
        return 2.0 * self.rotation_rate * jnp.sin(jnp.pi / 180.0 * phi_f)

    def x_f_cross_U(self, grid, u, v, w):
        f = self._f_ff(grid)
        dxv = grid.dx((C, F, C)) * v
        if self.scheme == "enstrophy":
            return -st.iyc(f) * st.ixf(st.iyc(dxv)) / grid.dx(U_LOC)
        return -st.iyc(f * st.ixf(dxv)) / grid.dx(U_LOC)

    def y_f_cross_U(self, grid, u, v, w):
        f = self._f_ff(grid)
        dyu = grid.dy((F, C, C)) * u
        if self.scheme == "enstrophy":
            return st.ixc(f) * st.iyf(st.ixc(dyu)) / grid.dy(V_LOC)
        return st.ixc(f * st.iyf(dyu)) / grid.dy(V_LOC)

    def z_f_cross_U(self, grid, u, v, w):
        return jnp.zeros_like(w)

    def tree_flatten(self):
        return (self.rotation_rate,), (self.scheme,)

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(leaves[0], scheme=static[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NonTraditionalBetaPlane:
    """Non-traditional β-plane (reference non_traditional_beta_plane.jl):
    fz = f₀ + βy (horizontal rotation) plus fy = γ + δ(z-ish) horizontal
    component 2Ωcosφ₀ with its β-correction."""

    fz0: float = 0.0      # 2Ω sinφ₀
    fy0: float = 0.0      # 2Ω cosφ₀
    beta: float = 0.0     # ∂y fz
    gamma: float = 0.0    # ∂y fy (−2Ω sinφ₀ / R correction)

    def _fz(self, grid, loc):
        y = grid.nodes(loc, with_halo=True)[1]
        return self.fz0 + self.beta * y

    def _fy(self, grid, loc):
        y = grid.nodes(loc, with_halo=True)[1]
        return self.fy0 + self.gamma * y

    def x_f_cross_U(self, grid, u, v, w):
        return (self._fy(grid, U_LOC) * st.ixf(st.izc(w))
                - self._fz(grid, U_LOC) * st.ixf(st.iyc(v)))

    def y_f_cross_U(self, grid, u, v, w):
        return self._fz(grid, V_LOC) * st.iyf(st.ixc(u))

    def z_f_cross_U(self, grid, u, v, w):
        return -self._fy(grid, W_LOC) * st.izf(st.ixc(u))

    def tree_flatten(self):
        return (self.fz0, self.fy0, self.beta, self.gamma), ()

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves)
