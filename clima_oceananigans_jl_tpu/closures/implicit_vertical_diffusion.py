"""Vertically-implicit diffusion: backward-Euler column solve.

TPU analog of /root/reference/src/TurbulenceClosures/
vertically_implicit_diffusion_solver.jl:44-70: after the explicit
(advection + horizontal diffusion) substep, each prognostic field is
updated by solving

    (I − Δt ∂z κ ∂z) c^{n+1} = c*

column-wise. The tridiagonal bands are built from κ evaluated at the
staggered z-location opposite the field's (faces for z-centered fields,
centers for w), and the batched Thomas solve (solvers/tridiagonal.py —
two ``lax.scan``s with the full horizontal plane as the TPU vector batch)
does the inversion. Zero-flux (Neumann) walls for z-centered fields;
zero-Dirichlet boundary faces for w.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..solvers.tridiagonal import solve_batched_tridiagonal
from ..utils.location import C, F


def _kappa_plane(kappa, grid, k_index, at_faces):
    """κ at one z level (face index or center index), broadcastable over (x,y)."""
    if callable(kappa):
        az = grid._axes[2]
        z = az.cf[k_index] if at_faces else az.cc[k_index]
        return kappa(z)
    k = jnp.asarray(kappa)
    if k.ndim == 0:
        return k
    if k.ndim == 1:  # 1D column profile, with-halo or interior+1 indexing
        return k[k_index]
    return k[:, :, k_index]  # 3D with-halo diffusivity array


def implicit_vertical_diffusion_step(data, grid, loc, kappa, dt,
                                     linear_coeff=None):
    """Solve (I − Δt(∂z κ ∂z + L)) out = data along z; returns with-halo
    array.

    `data`: with-halo (X, Y, Z) array. `kappa`: scalar, callable(z), 1D
    with-halo column, or 3D with-halo array, evaluated at z-faces for
    z-centered fields / z-centers for z-face fields. `linear_coeff`: an
    optional per-cell linear operator coefficient L ≤ 0 (with-halo 3D
    array at the field's own location) folded into the diagonal — used
    for CATKE's implicit dissipation Lᵉ = −Cᴰ√e/ℓ (reference
    vertically_implicit_diffusion_solver.jl + CATKE
    implicit_linear_coefficient).
    """
    az = grid._axes[2]
    Nz, Hz = az.n, az.h
    if Nz == 1:
        return data
    dzc = az.dc  # cell widths (center spacing), with-halo 1D
    dzf = az.df  # center-to-center distances (face spacing), with-halo 1D

    if loc[2] is C:
        # unknowns at cell centers k = 0..Nz−1; κ at faces k = 0..Nz
        def kap(kidx):  # κ at face kidx (logical), broadcast over (x,y)
            return _kappa_plane(kappa, grid, Hz + kidx, True)

        lower = []
        upper = []
        for k in range(Nz):
            a_k = -dt * kap(k) / (dzc[Hz + k] * dzf[Hz + k]) if k > 0 else 0.0
            c_k = -dt * kap(k + 1) / (dzc[Hz + k] * dzf[Hz + k + 1]) if k < Nz - 1 else 0.0
            lower.append(jnp.broadcast_to(jnp.asarray(a_k, data.dtype), data.shape[:2]))
            upper.append(jnp.broadcast_to(jnp.asarray(c_k, data.dtype), data.shape[:2]))
        a = jnp.stack(lower, axis=-1)
        c = jnp.stack(upper, axis=-1)
        b = 1.0 - a - c
        if linear_coeff is not None:
            b = b - dt * linear_coeff[:, :, Hz: Hz + Nz]
        rhs = data[:, :, Hz: Hz + Nz]
        sol = solve_batched_tridiagonal(a, b, c, rhs)
        return data.at[:, :, Hz: Hz + Nz].set(sol)

    # z-face-located (w): unknowns at interior faces k = 1..Nz−1, κ at centers;
    # boundary faces remain fixed (impenetrable walls ⇒ w = 0 there).
    def kapc(kidx):
        return _kappa_plane(kappa, grid, Hz + kidx, False)

    n = Nz - 1
    if n < 1:
        return data
    lower = []
    upper = []
    for j in range(n):
        k = j + 1  # face index
        a_k = -dt * kapc(k - 1) / (dzf[Hz + k] * dzc[Hz + k - 1]) if j > 0 else 0.0
        c_k = -dt * kapc(k) / (dzf[Hz + k] * dzc[Hz + k]) if j < n - 1 else 0.0
        lower.append(jnp.broadcast_to(jnp.asarray(a_k, data.dtype), data.shape[:2]))
        upper.append(jnp.broadcast_to(jnp.asarray(c_k, data.dtype), data.shape[:2]))
    a = jnp.stack(lower, axis=-1)
    c = jnp.stack(upper, axis=-1)
    b = 1.0 - a - c
    rhs = data[:, :, Hz + 1: Hz + Nz]
    sol = solve_batched_tridiagonal(a, b, c, rhs)
    return data.at[:, :, Hz + 1: Hz + Nz].set(sol)


def _vertical_coefficient(closure, name, diffusivities):
    """κz for one field from a closure (scalar config or per-step field)."""
    if name in ("u", "v", "w"):
        if hasattr(closure, "vertical_nu"):
            return closure.vertical_nu(diffusivities)
        return closure.nu_z if closure.nu_z is not None else closure.nu
    if hasattr(closure, "vertical_kappa"):
        return closure.vertical_kappa(name, diffusivities)
    return closure.kappa_z_for(name)


def implicit_step_fields(solution, grid, locs, closure, dt, diffusivities=None):
    """Apply the implicit vertical solve to every prognostic field
    (reference implicit_step!, quasi_adams_bashforth_2.jl:137-144).
    Closure tuples apply sequentially (operator splitting)."""
    if closure is None:
        return solution
    if isinstance(closure, (tuple, list)):
        diffusivities = diffusivities or (None,) * len(closure)
        for c, d in zip(closure, diffusivities):
            solution = implicit_step_fields(solution, grid, locs, c, dt, d)
        return solution
    if not getattr(closure, "vertically_implicit", False):
        return solution
    from ..ops import stencil as _st
    out = {}
    for name, data in solution.items():
        kz = _vertical_coefficient(closure, name, diffusivities)
        if hasattr(kz, "ndim") and kz.ndim == 3:
            # (C,C,F)-located diffusivity fields: move to the field's own
            # horizontal staggering
            if locs[name][0] is not C:
                kz = _st.ixf(kz)
            if locs[name][1] is not C:
                kz = _st.iyf(kz)
        lin = (closure.implicit_linear_coefficient(name, diffusivities)
               if hasattr(closure, "implicit_linear_coefficient") else None)
        out[name] = implicit_vertical_diffusion_step(data, grid, locs[name],
                                                     kz, dt, lin)
    return out
