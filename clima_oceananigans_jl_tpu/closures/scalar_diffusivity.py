"""Explicit scalar (and biharmonic) diffusivity closures.

Array form of the reference's ScalarDiffusivity / ScalarBiharmonicDiffusivity
(/root/reference/src/TurbulenceClosures/turbulence_closure_implementations/
scalar_diffusivity.jl, scalar_biharmonic_diffusivity.jl) and the generic
stress/flux divergences ∂ⱼτᵢⱼ, ∇·qᶜ
(abstract_scalar_diffusivity_closure.jl). Diffusivities may be scalars,
arrays, or callables of the grid (evaluated at trace time); isotropic or
(horizontal, vertical) split.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops import operators as op
from ..ops import stencil as st
from ..utils.location import CENTER


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ScalarDiffusivity:
    """ν (momentum) and κ (tracers; scalar or per-tracer dict).
    `nu_h/nu_z` allow horizontal/vertical anisotropy (reference
    Horizontal/VerticalScalarDiffusivity variants)."""

    nu: Any = 0.0
    kappa: Any = 0.0
    nu_z: Optional[Any] = None        # vertical ν (defaults to nu)
    kappa_z: Optional[Any] = None     # vertical κ (defaults to kappa)
    time_discretization: str = "explicit"  # or "vertically_implicit"

    def kappa_for(self, name):
        if isinstance(self.kappa, dict):
            return self.kappa.get(name, 0.0)
        return self.kappa

    def kappa_z_for(self, name):
        kz = self.kappa_z if self.kappa_z is not None else self.kappa
        if isinstance(kz, dict):
            return kz.get(name, 0.0)
        return kz

    @property
    def vertically_implicit(self):
        return self.time_discretization == "vertically_implicit"

    def tree_flatten(self):
        return (self.nu, self.kappa, self.nu_z, self.kappa_z), (self.time_discretization,)

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves, time_discretization=static[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ScalarBiharmonicDiffusivity:
    """4th-order hyperdiffusion −ν∇⁴ (reference scalar_biharmonic_diffusivity.jl)."""

    nu: Any = 0.0
    kappa: Any = 0.0

    def kappa_for(self, name):
        if isinstance(self.kappa, dict):
            return self.kappa.get(name, 0.0)
        return self.kappa

    vertically_implicit = False

    def tree_flatten(self):
        return (self.nu, self.kappa), ()

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves)


def HorizontalScalarDiffusivity(nu=0.0, kappa=0.0):
    """Horizontal-only ν/κ (reference HorizontalScalarDiffusivity) — the
    stable way to run large eddy viscosities on coarse vertical grids."""
    return ScalarDiffusivity(nu=nu, kappa=kappa, nu_z=0.0, kappa_z=0.0)


def VerticalScalarDiffusivity(nu=0.0, kappa=0.0,
                              time_discretization="explicit"):
    """Vertical-only ν/κ (reference VerticalScalarDiffusivity)."""
    return ScalarDiffusivity(nu=0.0, kappa=0.0, nu_z=nu, kappa_z=kappa,
                             time_discretization=time_discretization)


def div_kappa_grad(c, grid, loc, kappa, kappa_z=None, horizontal_only=False,
                   vertical=True):
    """∇·(κ∇c) at `loc` in FV form; κ may differ horizontally/vertically."""
    kz = kappa if kappa_z is None else kappa_z
    fx = grid.Ax(op.flip_loc(loc, 0)) * (kappa * op.dd(c, grid, 0, loc))
    fy = grid.Ay(op.flip_loc(loc, 1)) * (kappa * op.dd(c, grid, 1, loc))
    out = (op.delta(fx, 0, op.flip_loc(loc, 0))
           + op.delta(fy, 1, op.flip_loc(loc, 1)))
    if vertical and not horizontal_only:
        fz = grid.Az(op.flip_loc(loc, 2)) * (kz * op.dd(c, grid, 2, loc))
        out = out + op.delta(fz, 2, op.flip_loc(loc, 2))
    return out / grid.V(loc)


def biharmonic(c, grid, loc, kappa):
    """−∇·(κ∇(∇²c)): computed as two laplacian passes (needs halo ≥ 2 and a
    halo refill between passes is avoided by consuming 2 halo cells)."""
    lap = op.laplacian(c, grid, loc)
    return -div_kappa_grad(lap, grid, loc, kappa)


def momentum_diffusion(u, grid, u_loc, closure):
    """∂ⱼτᵢⱼ contribution −∇·(ν∇u) for one velocity component (explicit part).

    Returns the *tendency* contribution +∇·(ν∇u) (reference tendencies
    subtract ∂ⱼτᵢⱼ where τ = −ν∇u)."""
    if closure is None:
        return jnp.zeros_like(u)
    if isinstance(closure, ScalarBiharmonicDiffusivity):
        return biharmonic(u, grid, u_loc, closure.nu)
    nu_z = closure.nu_z if closure.nu_z is not None else closure.nu
    return div_kappa_grad(u, grid, u_loc, closure.nu, nu_z,
                          vertical=not closure.vertically_implicit)


def tracer_diffusion(c, grid, name, closure):
    """∇·(κ∇c) tendency contribution for a tracer (explicit part)."""
    if closure is None:
        return jnp.zeros_like(c)
    if isinstance(closure, ScalarBiharmonicDiffusivity):
        return biharmonic(c, grid, CENTER, closure.kappa_for(name))
    return div_kappa_grad(c, grid, CENTER, closure.kappa_for(name),
                          closure.kappa_z_for(name),
                          vertical=not closure.vertically_implicit)
