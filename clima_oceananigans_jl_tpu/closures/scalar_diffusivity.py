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
    """4th-order hyperdiffusion −ν∇⁴ (reference
    scalar_biharmonic_diffusivity.jl). ``formulation``:
    'three_dimensional' (default, like the reference) or 'horizontal'
    (∇h⁴ only — the standard choice for eddy-permitting channels, where
    an isotropic ν₄ sized for Δx≫Δz would be wildly unstable along z)."""

    nu: Any = 0.0
    kappa: Any = 0.0
    formulation: str = "three_dimensional"

    def kappa_for(self, name):
        if isinstance(self.kappa, dict):
            return self.kappa.get(name, 0.0)
        return self.kappa

    vertically_implicit = False

    def tree_flatten(self):
        return (self.nu, self.kappa), (self.formulation,)

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*leaves, formulation=static[0])


def HorizontalScalarDiffusivity(nu=0.0, kappa=0.0):
    """Horizontal-only ν/κ (reference HorizontalScalarDiffusivity) — the
    stable way to run large eddy viscosities on coarse vertical grids."""
    return ScalarDiffusivity(nu=nu, kappa=kappa, nu_z=0.0, kappa_z=0.0)


def VerticalScalarDiffusivity(nu=0.0, kappa=0.0,
                              time_discretization="explicit"):
    """Vertical-only ν/κ (reference VerticalScalarDiffusivity)."""
    return ScalarDiffusivity(nu=0.0, kappa=0.0, nu_z=nu, kappa_z=kappa,
                             time_discretization=time_discretization)


def _kappa_at_flux_loc(kappa, loc, axis, from_loc=None):
    """Interpolate a 3D κ array from `from_loc` (default centers) onto the
    flux location for `axis`. Scalars pass through."""
    from ..utils.location import CENTER as _CTR
    if not (hasattr(kappa, "ndim") and kappa.ndim == 3):
        return kappa
    target = op.flip_loc(loc, axis)
    return op.interp_to(kappa, from_loc or _CTR, target)


def div_kappa_grad(c, grid, loc, kappa, kappa_z=None, horizontal_only=False,
                   vertical=True, kappa_z_at_faces=False):
    """∇·(κ∇c) at `loc` in FV form; κ may be a scalar, horizontally/
    vertically split, or a 3D eddy-diffusivity array (center-located by
    default, interpolated onto flux faces; set `kappa_z_at_faces` when
    the vertical diffusivity lives at (C,C,F) like the boundary-layer
    schemes produce)."""
    from ..utils.location import C as _C, F as _F
    kz = kappa if kappa_z is None else kappa_z
    kx = _kappa_at_flux_loc(kappa, loc, 0)
    ky = _kappa_at_flux_loc(kappa, loc, 1)
    imm = getattr(grid, "immersed", None)

    def _zero_solid(f, axis):
        # no diffusive flux through immersed faces (reference
        # immersed_boundary_condition.jl default no-flux behavior); also
        # keeps masked-zero solid values from acting as Dirichlet-0
        if imm is None:
            return f
        return jnp.where(imm.mask_for(tuple(op.flip_loc(loc, axis))), 0.0, f)

    fx = _zero_solid(grid.Ax(op.flip_loc(loc, 0))
                     * (kx * op.dd(c, grid, 0, loc)), 0)
    fy = _zero_solid(grid.Ay(op.flip_loc(loc, 1))
                     * (ky * op.dd(c, grid, 1, loc)), 1)
    out = (op.delta(fx, 0, op.flip_loc(loc, 0))
           + op.delta(fy, 1, op.flip_loc(loc, 1)))
    if vertical and not horizontal_only:
        kz_from = (_C, _C, _F) if kappa_z_at_faces else None
        kzf = _kappa_at_flux_loc(kz, loc, 2, from_loc=kz_from)
        fz = _zero_solid(grid.Az(op.flip_loc(loc, 2))
                         * (kzf * op.dd(c, grid, 2, loc)), 2)
        out = out + op.delta(fz, 2, op.flip_loc(loc, 2))
    return out / grid.V(loc)


def biharmonic(c, grid, loc, kappa, horizontal=False):
    """−∇·(κ∇(∇²c)): computed as two laplacian passes (needs halo ≥ 2 and a
    halo refill between passes is avoided by consuming 2 halo cells).
    ``horizontal=True`` → ∇h⁴ (HorizontalFormulation)."""
    axes = (0, 1) if horizontal else (0, 1, 2)
    lap = op.laplacian(c, grid, loc, axes=axes)
    return -div_kappa_grad(lap, grid, loc, kappa, vertical=not horizontal)


def compute_closure_diffusivities(closure, grid, fields, buoyancy, tracers):
    """The reference's ``calculate_diffusivities!`` pass: one entry per
    closure (tuples supported, reference closure_tuples.jl)."""
    if closure is None:
        return None
    if isinstance(closure, (tuple, list)):
        return tuple(compute_closure_diffusivities(c, grid, fields, buoyancy,
                                                   tracers) for c in closure)
    if hasattr(closure, "compute_diffusivities"):
        return closure.compute_diffusivities(grid, fields, buoyancy, tracers)
    return None


def momentum_diffusion(u, grid, u_loc, closure, diffusivities=None):
    """∂ⱼτᵢⱼ contribution −∇·(ν∇u) for one velocity component (explicit part).

    Returns the *tendency* contribution +∇·(ν∇u) (reference tendencies
    subtract ∂ⱼτᵢⱼ where τ = −ν∇u)."""
    if closure is None:
        return jnp.zeros_like(u)
    if isinstance(closure, (tuple, list)):
        out = jnp.zeros_like(u)
        diffusivities = diffusivities or (None,) * len(closure)
        for c, d in zip(closure, diffusivities):
            out = out + momentum_diffusion(u, grid, u_loc, c, d)
        return out
    if isinstance(closure, ScalarBiharmonicDiffusivity):
        return biharmonic(u, grid, u_loc, closure.nu,
                          horizontal=closure.formulation == "horizontal")
    if isinstance(closure, ScalarDiffusivity):
        nu_z = closure.nu_z if closure.nu_z is not None else closure.nu
        return div_kappa_grad(u, grid, u_loc, closure.nu, nu_z,
                              vertical=not closure.vertically_implicit)
    # diffusivity-field closures (LES / vertical-mixing schemes)
    nu = closure.nu(diffusivities)
    nu_z = (closure.vertical_nu(diffusivities)
            if hasattr(closure, "vertical_nu") else nu)
    return div_kappa_grad(u, grid, u_loc, nu, nu_z,
                          vertical=not closure.vertically_implicit,
                          kappa_z_at_faces=hasattr(closure, "vertical_nu"))


def tracer_diffusion(c, grid, name, closure, diffusivities=None):
    """∇·(κ∇c) tendency contribution for a tracer (explicit part)."""
    if closure is None:
        return jnp.zeros_like(c)
    if isinstance(closure, (tuple, list)):
        out = jnp.zeros_like(c)
        diffusivities = diffusivities or (None,) * len(closure)
        for cl, d in zip(closure, diffusivities):
            out = out + tracer_diffusion(c, grid, name, cl, d)
        return out
    if isinstance(closure, ScalarBiharmonicDiffusivity):
        return biharmonic(c, grid, CENTER, closure.kappa_for(name),
                          horizontal=closure.formulation == "horizontal")
    if isinstance(closure, ScalarDiffusivity):
        return div_kappa_grad(c, grid, CENTER, closure.kappa_for(name),
                              closure.kappa_z_for(name),
                              vertical=not closure.vertically_implicit)
    if hasattr(closure, "tracer_tendency"):  # GM/Redi-style rotated fluxes
        return closure.tracer_tendency(c, grid, name, diffusivities)
    kap = closure.kappa_for_tracer(name, diffusivities)
    kap_z = (closure.vertical_kappa(name, diffusivities)
             if hasattr(closure, "vertical_kappa") else kap)
    return div_kappa_grad(c, grid, CENTER, kap, kap_z,
                          vertical=not closure.vertically_implicit,
                          kappa_z_at_faces=hasattr(closure, "vertical_kappa"))


def _max_diffusivity(value, tracer_names=()):
    """Maximum magnitude of a diffusivity spec: scalar, per-tracer dict,
    or 3D array (LES diffusivity fields). Grid-callables (evaluated at
    trace time elsewhere) are excluded — they cannot be bounded here."""
    if value is None:
        return 0.0
    if isinstance(value, dict):
        names = tracer_names or tuple(value)
        return max((_max_diffusivity(value.get(n, 0.0)) for n in names),
                   default=0.0)
    if callable(value) and not hasattr(value, "ndim"):
        return 0.0
    return float(jnp.max(jnp.abs(jnp.asarray(value))))


def cell_diffusion_timescale(closure, grid, diffusivities=None,
                             tracer_names=()):
    """min over closures/fields of Δ²/max(ν, κ) — the diffusive stability
    timescale (reference
    /root/reference/src/TurbulenceClosures/turbulence_closure_diagnostics.jl).

    Semantics matched to the reference: horizontal diffusivities are
    limited by the minimum horizontal spacing, vertical ones by min Δz;
    a closure with vertically-implicit time discretization does not limit
    Δt through its vertical part; biharmonic closures limit by Δ⁴/ν.
    Returns +inf when nothing limits (no closure / all implicit)."""
    import numpy as np
    from ..grids.topology import FLAT

    if closure is None:
        return np.inf
    if isinstance(closure, (tuple, list)):
        diffs = diffusivities if diffusivities is not None \
            else (None,) * len(closure)
        return min(cell_diffusion_timescale(c, grid, d, tracer_names)
                   for c, d in zip(closure, diffs))

    def _min_sp(axis):
        return float(jnp.min(jnp.asarray(grid.spacing(axis, CENTER))))

    h_sp = [_min_sp(a) for a in (0, 1) if grid.topology[a] is not FLAT]
    dh = min(h_sp) if h_sp else np.inf
    dz = _min_sp(2) if grid.topology[2] is not FLAT else np.inf

    def ts(delta, kap, power=2):
        if kap > 0.0 and np.isfinite(delta):
            return delta ** power / kap
        return np.inf

    if isinstance(closure, ScalarBiharmonicDiffusivity):
        d = dh if closure.formulation == "horizontal" else min(dh, dz)
        kap = max(_max_diffusivity(closure.nu),
                  _max_diffusivity(closure.kappa, tracer_names))
        return ts(d, kap, power=4)

    if isinstance(closure, ScalarDiffusivity):
        kap_h = max(_max_diffusivity(closure.nu),
                    _max_diffusivity(closure.kappa, tracer_names))
        t = ts(dh, kap_h)
        if not closure.vertically_implicit:
            nu_z = closure.nu_z if closure.nu_z is not None else closure.nu
            kz = closure.kappa_z if closure.kappa_z is not None \
                else closure.kappa
            kap_z = max(_max_diffusivity(nu_z),
                        _max_diffusivity(kz, tracer_names))
            t = min(t, ts(dz, kap_z))
        return t

    # diffusivity-field closures (LES / vertical-mixing / GM-Redi): the
    # current νₑ/κₑ fields live in `diffusivities` (state["diffusivities"])
    t = np.inf
    if diffusivities is None:
        return t
    kap = 0.0
    if hasattr(closure, "nu"):
        kap = _max_diffusivity(closure.nu(diffusivities))
    if hasattr(closure, "kappa_for_tracer"):
        kap = max(kap, max((_max_diffusivity(
            closure.kappa_for_tracer(n, diffusivities))
            for n in tracer_names), default=0.0))
    # isotropic / horizontal part
    iso_d = dh if closure.vertically_implicit else min(dh, dz)
    t = min(t, ts(iso_d, kap))
    if not closure.vertically_implicit:
        kz = 0.0
        if hasattr(closure, "vertical_nu"):
            kz = _max_diffusivity(closure.vertical_nu(diffusivities))
        if hasattr(closure, "vertical_kappa"):
            kz = max(kz, max((_max_diffusivity(
                closure.vertical_kappa(n, diffusivities))
                for n in tracer_names), default=0.0))
        t = min(t, ts(dz, kz))
    return t
