"""Vertical boundary-layer mixing schemes.

Array re-design of /root/reference/src/TurbulenceClosures/
turbulence_closure_implementations/{convective_adjustment_vertical_diffusivity.jl,
ri_based_vertical_diffusivity.jl, CATKEVerticalDiffusivities/}: each
scheme produces face-located vertical diffusivities κz(x,y,z) from the
state, consumed vertically-implicitly (batched Thomas solve) by default.
CATKE adds a prognostic turbulent-kinetic-energy tracer ``e`` with
shear-production, buoyancy-flux and dissipation source terms.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import stencil as st
from ..utils.location import C, CENTER, F, U_LOC, V_LOC, W_LOC


def buoyancy_gradient_faces(grid, buoyancy, tracers):
    """N² = ∂z b at (C,C,F)."""
    b = buoyancy.buoyancy_perturbation(grid, tracers)
    return st.dzf(b) / grid.dz(W_LOC)


def shear_squared_faces(grid, u, v):
    """S² = (∂z u)² + (∂z v)² at (C,C,F) (velocity gradients interpolated
    to centers horizontally)."""
    dzu = st.ixc(st.dzf(u)) / grid.dz((C, C, F))
    dzv = st.iyc(st.dzf(v)) / grid.dz((C, C, F))
    return dzu * dzu + dzv * dzv


@dataclasses.dataclass(frozen=True)
class ConvectiveAdjustmentVerticalDiffusivity:
    """κz = κ_convective where N² < 0 else κ_background
    (reference convective_adjustment_vertical_diffusivity.jl)."""

    convective_kappa_z: float = 1.0
    convective_nu_z: float = 0.0
    background_kappa_z: float = 1e-5
    background_nu_z: float = 1e-5
    time_discretization: str = "vertically_implicit"

    @property
    def vertically_implicit(self):
        return self.time_discretization == "vertically_implicit"

    def compute_diffusivities(self, grid, fields, buoyancy, tracers):
        n2 = buoyancy_gradient_faces(grid, buoyancy, tracers)
        unstable = n2 < 0
        kz = jnp.where(unstable, self.convective_kappa_z, self.background_kappa_z)
        nz = jnp.where(unstable, self.convective_nu_z, self.background_nu_z)
        return dict(kappa_z=kz, nu_z=nz)

    def nu(self, diffusivities):
        return 0.0  # horizontal part zero

    def kappa_for_tracer(self, name, diffusivities):
        return 0.0

    def vertical_nu(self, diffusivities):
        return diffusivities["nu_z"]

    def vertical_kappa(self, name, diffusivities):
        return diffusivities["kappa_z"]


@dataclasses.dataclass(frozen=True)
class RiBasedVerticalDiffusivity:
    """Richardson-number step scheme (reference
    ri_based_vertical_diffusivity.jl): κz = κ₀ + κᶜ·step(Ri) with
    Ri = N²/S², a smooth step from 1 (Ri≤0) to 0 (Ri≥Ri_c)."""

    nu_0: float = 0.7
    kappa_0: float = 0.5
    Ri_0: float = 0.1
    Ri_delta: float = 0.4
    background_kappa_z: float = 1e-5
    background_nu_z: float = 1e-5
    time_discretization: str = "vertically_implicit"

    @property
    def vertically_implicit(self):
        return self.time_discretization == "vertically_implicit"

    def _step(self, ri):
        return 0.5 * (1.0 - jnp.tanh((ri - self.Ri_0) / self.Ri_delta))

    def compute_diffusivities(self, grid, fields, buoyancy, tracers):
        n2 = buoyancy_gradient_faces(grid, buoyancy, tracers)
        s2 = shear_squared_faces(grid, fields["u"], fields["v"])
        ri = n2 / jnp.maximum(s2, 1e-30)
        stepf = self._step(ri)
        kz = self.background_kappa_z + self.kappa_0 * stepf
        nz = self.background_nu_z + self.nu_0 * stepf
        return dict(kappa_z=kz, nu_z=nz)

    def nu(self, diffusivities):
        return 0.0

    def kappa_for_tracer(self, name, diffusivities):
        return 0.0

    def vertical_nu(self, diffusivities):
        return diffusivities["nu_z"]

    def vertical_kappa(self, name, diffusivities):
        return diffusivities["kappa_z"]


@dataclasses.dataclass(frozen=True)
class CATKEVerticalDiffusivity:
    """TKE-based boundary-layer scheme of the CATKE family (reference
    CATKEVerticalDiffusivities/, 768 LoC): a prognostic TKE tracer ``e``
    with mixing length ℓ = min(Cˡᶻ·d, Cᵇ √e/N), diffusivities
    νz = Cᵏᵘ ℓ √e, κz = Cᵏᶜ ℓ √e, and the TKE tendency

        ∂t e += νz S² − κz N² − Cᴰ e^{3/2}/ℓ

    (shear production, buoyancy flux, dissipation). The model adds ``e``
    to its tracers automatically via ``required_tracers``.
    """

    C_nu: float = 0.1     # Cᵏᵘ
    C_kappa: float = 0.1  # Cᵏᶜ
    C_diss: float = 0.3   # Cᴰ
    C_len_N: float = 0.7  # Cᵇ: stratification length √e/N multiplier
    C_surface: float = 0.4  # von-Karman-like wall-length coefficient
    C_ke: float = 1.0       # TKE's own vertical diffusivity multiplier
    min_tke: float = 1e-9
    background_kappa_z: float = 1e-5
    background_nu_z: float = 1e-5
    time_discretization: str = "vertically_implicit"

    required_tracers = ("e",)

    @property
    def vertically_implicit(self):
        return self.time_discretization == "vertically_implicit"

    def _mixing_length(self, grid, e, n2):
        zf = grid.coord(2, F, with_halo=True).reshape(1, 1, -1)
        z_top = grid._axes[2].cf[grid.Hz + grid.Nz]
        z_bot = grid._axes[2].cf[grid.Hz]
        d = jnp.minimum(z_top - zf, zf - z_bot)  # distance to nearest boundary
        d = jnp.maximum(d, 0.0)
        sqrt_e = jnp.sqrt(jnp.maximum(e, self.min_tke))
        l_strat = self.C_len_N * sqrt_e / jnp.sqrt(jnp.maximum(n2, 1e-30))
        l_wall = self.C_surface * d
        ell = jnp.minimum(l_wall, jnp.where(n2 > 0, l_strat, l_wall))
        dz = jnp.broadcast_to(grid.dz(W_LOC), ell.shape)
        return jnp.maximum(ell, dz)  # floor at the local grid spacing

    def compute_diffusivities(self, grid, fields, buoyancy, tracers):
        e_faces = st.izf(tracers["e"])  # TKE interpolated to faces
        n2 = buoyancy_gradient_faces(grid, buoyancy, tracers)
        ell = self._mixing_length(grid, e_faces, n2)
        sqrt_e = jnp.sqrt(jnp.maximum(e_faces, self.min_tke))
        nu_z = self.C_nu * ell * sqrt_e + self.background_nu_z
        kappa_z = self.C_kappa * ell * sqrt_e + self.background_kappa_z
        return dict(nu_z=nu_z, kappa_z=kappa_z, ell=ell, n2=n2)

    def nu(self, diffusivities):
        return 0.0

    def kappa_for_tracer(self, name, diffusivities):
        return 0.0

    def vertical_nu(self, diffusivities):
        return diffusivities["nu_z"]

    def vertical_kappa(self, name, diffusivities):
        if name == "e":
            return self.C_ke * diffusivities["nu_z"]
        return diffusivities["kappa_z"]

    def tke_tendency(self, grid, fields, diffusivities, tracers):
        """Shear production − buoyancy flux − dissipation, at centers."""
        s2 = shear_squared_faces(grid, fields["u"], fields["v"])
        nu_z, kappa_z = diffusivities["nu_z"], diffusivities["kappa_z"]
        prod = st.izc(nu_z * s2)
        buoy = st.izc(kappa_z * diffusivities["n2"])
        e = jnp.maximum(tracers["e"], 0.0)
        ell_c = st.izc(diffusivities["ell"])
        diss = self.C_diss * e ** 1.5 / jnp.maximum(ell_c, 1e-30)
        return prod - buoy - diss
