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
    """S² = ℑxᶜ[(∂zᶠᶜᶠ u)²] + ℑyᶜ[(∂zᶜᶠᶠ v)²] at (C,C,F) — the gradients
    are squared BEFORE horizontal interpolation (reference
    mixing_length.jl:122-123 `ℑxᶜᵃᵃ(ϕ², ∂zᶠᶜᶠ, u)`)."""
    dzu = st.dzf(u) / grid.dz((F, C, F))
    dzv = st.dzf(v) / grid.dz((C, F, F))
    return st.ixc(dzu * dzu) + st.iyc(dzv * dzv)


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
class MixingLength:
    """CATKE mixing-length free parameters, LES-calibrated defaults
    (reference CATKEVerticalDiffusivities/mixing_length.jl:65-91).

    The mixing length for quantity φ ∈ {u (momentum), c (tracers),
    e (TKE)} combines a grid-spacing length ℓᵟ = Cᵟφ Δz, a convective
    length ℓᴬ = Cᴬφ e^{3/2}/Qᵇ (active while N²<0 and Qᵇ>0), and a
    stable length ℓ★ = σφ(Ri)·min(d, Cᵇφ √e/N, Cˢφ √e/S), where σφ is
    the Ri-dependent stability scale σ = σ⁻ + rσ·(1 + tanh((Ri−Riᶜ)/Riʷ)).
    """

    Cb: float = float("inf")    # Cᵇ global cap (inert default)
    Cs: float = float("inf")    # Cˢ global cap (inert default)
    Cb_u: float = 1.55
    Cb_c: float = 0.01
    Cb_e: float = 0.60
    Cs_u: float = 5.1
    Cs_c: float = 4.3
    Cs_e: float = 1.49
    Cd_u: float = 0.5           # Cᵟu
    Cd_c: float = 0.5
    Cd_e: float = 0.5
    Ca_u: float = 0.0           # Cᴬu (convective)
    Ca_c: float = 0.0
    Ca_e: float = 0.0
    Cas_u: float = 0.0          # Cᴬˢu (sheared-convection correction)
    Cas_c: float = 0.0
    Cas_e: float = 0.0
    Ck_u_lo: float = 0.14       # Cᴷu⁻
    Ck_u_r: float = 0.1         # Cᴷuʳ
    Ck_c_lo: float = 0.35
    Ck_c_r: float = 0.05
    Ck_e_lo: float = 0.49
    Ck_e_r: float = 17.0
    Ck_Ri_w: float = 30.0       # CᴷRiʷ
    Ck_Ri_c: float = 1.1        # CᴷRiᶜ


@dataclasses.dataclass(frozen=True)
class SurfaceTKEFlux:
    """Surface TKE flux parameters (reference surface_TKE_flux.jl:25-28):
    Qᵉ = −Cᴰ (Cᵂu★ u★³ + CᵂwΔ w★³)."""

    Cw_u: float = 0.01   # Cᵂu★
    Cw_w: float = 40.0   # CᵂwΔ


@dataclasses.dataclass(frozen=True)
class CATKEVerticalDiffusivity:
    """CATKE boundary-layer scheme at the reference's formulation
    (reference CATKEVerticalDiffusivities/, 768 LoC): a prognostic TKE
    tracer ``e`` with the LES-calibrated mixing-length model above,
    per-quantity diffusivities at (C,C,F)

        Kᵘ = ℓu √e⁺,  Kᶜ = ℓc √e⁺,  Kᵉ = ℓe √e⁺,

    the TKE tendency (turbulent_kinetic_energy_equation.jl:15-26)

        ∂t e += Kᵘ S² − Kᶜ N² − Cᴰ e^{3/2}/ℓe + surface flux,

    with the dissipation treated VERTICALLY IMPLICITLY via the linear
    coefficient Lᵉ = −Cᴰ √|e| / ℓe folded into the column solve
    (implicit_dissipation_coefficient, :32-49), and the surface TKE flux
    Qᵉ = −Cᴰ(Cᵂu★ u★³ + CᵂwΔ w★³) from the surface momentum/buoyancy
    fluxes (surface_TKE_flux.jl:50-77).

    Surface forcing is supplied via ``surface_momentum_flux`` (a (Qu, Qv)
    pair) and ``surface_buoyancy_flux`` (Qᵇ > 0 = destabilizing); each
    entry is a scalar or an (x, y) with-halo array. The model adds ``e``
    to its tracers automatically via ``required_tracers``.
    """

    C_diss: float = 0.81  # Cᴰ (CATKEVerticalDiffusivities.jl:108)
    mixing_length: MixingLength = MixingLength()
    surface_tke_flux: SurfaceTKEFlux = SurfaceTKEFlux()
    surface_momentum_flux: Any = None   # (Qu, Qv) kinematic stress
    surface_buoyancy_flux: Any = None   # Qᵇ
    min_tke: float = 1e-12
    background_kappa_z: float = 1e-5
    background_nu_z: float = 1e-5
    time_discretization: str = "vertically_implicit"

    required_tracers = ("e",)

    @property
    def vertically_implicit(self):
        return self.time_discretization == "vertically_implicit"

    # -- pieces ---------------------------------------------------------
    def _wall_distance(self, grid):
        """min(depth below surface, height above bottom) at (C,C,F)."""
        zf = grid.coord(2, F, with_halo=True).reshape(1, 1, -1)
        z_top = grid._axes[2].cf[grid.Hz + grid.Nz]
        z_bot = grid._axes[2].cf[grid.Hz]
        return jnp.maximum(jnp.minimum(z_top - zf, zf - z_bot), 0.0)

    def _stability_scale(self, ri, lo, r):
        ml = self.mixing_length
        stp = 1.0 + jnp.tanh((ri - ml.Ck_Ri_c) / ml.Ck_Ri_w)
        return lo + r * stp

    def _qb(self, grid, dtype):
        qb = self.surface_buoyancy_flux
        if qb is None:
            return None
        return jnp.asarray(qb, dtype)

    def _convective_length(self, grid, Ca, Cas, e_plus, s, n2, qb):
        """ℓʰ = Cᴬ e⁺^{3/2}/Qᵇ (1 − Cᴬˢ α) while convecting
        (mixing_length.jl:137-162)."""
        if Ca == 0.0 or qb is None:
            return None
        qb = jnp.maximum(qb, 1e-30)
        alpha = s * qb / jnp.maximum(e_plus, self.min_tke)
        ell_a = e_plus ** 1.5 / qb
        ell_h = Ca * ell_a * (1.0 - Cas * alpha)
        convecting = (n2 < 0) & (qb > 0) & (e_plus > 0)
        return jnp.where(convecting, ell_h, 0.0)

    def _lengths(self, grid, e, u, v, buoyancy, tracers):
        """ℓu, ℓc, ℓe at (C,C,F) plus (N², S², e⁺, √e⁺) diagnostics."""
        ml = self.mixing_length
        e_plus = st.izf(jnp.maximum(e, 0.0))                # ℑz e⁺
        sqrt_e = jnp.sqrt(jnp.maximum(e_plus, 0.0))
        n2 = buoyancy_gradient_faces(grid, buoyancy, tracers)
        s2 = shear_squared_faces(grid, u, v)
        s = jnp.sqrt(s2)
        n_plus = jnp.sqrt(jnp.maximum(n2, 0.0))
        # Ri at (C,C,F) (mixing_length.jl:174-180)
        ri = jnp.where(n2 == 0.0, 0.0, n2 / jnp.maximum(s2, 1e-30))
        big = jnp.asarray(3.0e38, e_plus.dtype)
        ell_b = jnp.where(n_plus > 0, sqrt_e / jnp.maximum(n_plus, 1e-30), big)
        ell_s = jnp.where(s > 0, sqrt_e / jnp.maximum(s, 1e-30), big)
        d = self._wall_distance(grid)
        dz = jnp.broadcast_to(grid.dz(W_LOC), e_plus.shape)
        qb = self._qb(grid, e_plus.dtype)

        def length(Cb, Cs, Cd, Ca, Cas, lo, r, use_conv=True):
            l_star = jnp.minimum(d, jnp.minimum(
                min(ml.Cb, Cb) * ell_b, min(ml.Cs, Cs) * ell_s))
            sig = self._stability_scale(ri, lo, r)
            base = sig * jnp.maximum(Cd * dz, l_star)
            if use_conv:
                lh = self._convective_length(grid, Ca, Cas, e_plus, s, n2, qb)
                if lh is not None:
                    base = jnp.maximum(lh, base)
            return base

        # momentum ignores ℓʰ (mixing_length.jl:226)
        ell_u = length(ml.Cb_u, ml.Cs_u, ml.Cd_u, ml.Ca_u, ml.Cas_u,
                       ml.Ck_u_lo, ml.Ck_u_r, use_conv=False)
        ell_c = length(ml.Cb_c, ml.Cs_c, ml.Cd_c, ml.Ca_c, ml.Cas_c,
                       ml.Ck_c_lo, ml.Ck_c_r)
        ell_e = length(ml.Cb_e, ml.Cs_e, ml.Cd_e, ml.Ca_e, ml.Cas_e,
                       ml.Ck_e_lo, ml.Ck_e_r)
        return ell_u, ell_c, ell_e, n2, s2, sqrt_e

    # -- protocol --------------------------------------------------------
    def compute_diffusivities(self, grid, fields, buoyancy, tracers):
        e = tracers["e"]
        ell_u, ell_c, ell_e, n2, s2, sqrt_e = self._lengths(
            grid, e, fields["u"], fields["v"], buoyancy, tracers)
        Ku = ell_u * sqrt_e + self.background_nu_z
        Kc = ell_c * sqrt_e + self.background_kappa_z
        Ke = ell_e * sqrt_e + self.background_kappa_z
        # implicit dissipation coefficient Lᵉ at centers:
        # L = −Cᴰ √|e| / ℓe (turbulent_kinetic_energy_equation.jl:32-49)
        ell_e_c = jnp.maximum(st.izc(ell_e), 1e-30)
        Le = -self.C_diss * jnp.sqrt(jnp.abs(e)) / ell_e_c
        return dict(Ku=Ku, Kc=Kc, Ke=Ke, Le=Le, n2=n2, s2=s2)

    def nu(self, diffusivities):
        return 0.0  # horizontal part zero (VerticalFormulation)

    def kappa_for_tracer(self, name, diffusivities):
        return 0.0

    def vertical_nu(self, diffusivities):
        return diffusivities["Ku"]

    def vertical_kappa(self, name, diffusivities):
        return diffusivities["Ke" if name == "e" else "Kc"]

    def implicit_linear_coefficient(self, name, diffusivities):
        """Per-field linear term folded into the implicit column solve
        (reference implicit_linear_coefficient,
        CATKEVerticalDiffusivities.jl:189-192)."""
        if name == "e" and self.vertically_implicit:
            return diffusivities["Le"]
        return None

    def _surface_tke_flux(self, grid, dtype):
        """Qᵉ = −Cᴰ(Cᵂu★ u★³ + CᵂwΔ w★³) (surface_TKE_flux.jl:50-77)."""
        sf = self.surface_tke_flux
        qu_qv = self.surface_momentum_flux
        qb = self._qb(grid, dtype)
        if qu_qv is None and qb is None:
            return None
        u_star3 = 0.0
        if qu_qv is not None:
            qu = jnp.asarray(qu_qv[0], dtype)
            qv = jnp.asarray(qu_qv[1], dtype)
            u_star3 = (qu * qu + qv * qv) ** 0.75
        w_star3 = 0.0
        if qb is not None:
            dz_top = grid._axes[2].dc[grid.Hz + grid.Nz - 1]
            w_star3 = jnp.maximum(qb, 0.0) * dz_top
        return -self.C_diss * (sf.Cw_u * u_star3 + sf.Cw_w * w_star3)

    def tke_tendency(self, grid, fields, diffusivities, tracers):
        """Shear production + buoyancy flux (+ explicit dissipation when
        not vertically implicit) + surface TKE flux, at centers
        (turbulent_kinetic_energy_equation.jl:15-26)."""
        d = diffusivities
        # production terms use center-interpolated diffusivities and the
        # center-located gradients (ℑxzᶜᵃᶜ of squares)
        u, v = fields["u"], fields["v"]
        dzu = st.dzf(u) / grid.dz((F, C, F))
        dzv = st.dzf(v) / grid.dz((C, F, F))
        s2_c = st.ixc(st.izc(dzu * dzu)) + st.iyc(st.izc(dzv * dzv))
        prod = st.izc(d["Ku"]) * s2_c
        buoy = -st.izc(d["Kc"]) * st.izc(d["n2"])
        G = prod + buoy
        if not self.vertically_implicit:
            G = G + tracers["e"] * d["Le"]  # explicit −ε = e·L, L < 0
        qe = self._surface_tke_flux(grid, G.dtype)
        if qe is not None:
            # top-cell flux divergence, same sign convention as
            # apply_flux_bcs (side=1 ⇒ −q/Δz); Qᵉ < 0 injects TKE
            Hz, Nz = grid.Hz, grid.Nz
            dz_top = grid._axes[2].dc[Hz + Nz - 1]
            contrib = -qe / dz_top
            if hasattr(contrib, "ndim") and contrib.ndim == 3:
                contrib = contrib[:, :, 0]
            G = G.at[:, :, Hz + Nz - 1].add(contrib)
        return G
