"""Nonlinear equations of state for seawater buoyancy.

Analog of the reference's SeawaterPolynomials.jl integration
(/root/reference/src/BuoyancyModels/nonlinear_equation_of_state.jl):
``SeawaterBuoyancy(equation_of_state=...)`` accepts any object with
``density_anomaly(T, S, z) -> ρ′`` and ``reference_density``.

* ``RoquetIdealizedEquationOfState`` — the second-order "realistic
  idealized" EOS of Roquet et al. (2015, JPO, "Defining a Simplified yet
  Realistic Equation of State for Seawater"): linear haline contraction
  plus thermal cabbeling (½Cᵇ Θ²) and thermobaricity (Tʰ Θ z) terms —
  the dominant nonlinearities of TEOS-10 for Boussinesq modeling.
* ``PolynomialEquationOfState`` — arbitrary polynomial in (Θ, S, z)
  given as {(i, j, k): coeff} for ρ′ = Σ c · Θⁱ Sʲ zᵏ, the container
  format a full 55-term TEOS-10 fit drops into.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple


@dataclasses.dataclass(frozen=True)
class RoquetIdealizedEquationOfState:
    """ρ′(Θ,S,z) = −½Cᵇ(Θ−Θ₀)² − Tʰ(Θ−Θ₀)z + β₀(S−S₀) − α₀(Θ−Θ₀)."""

    thermal_expansion: float = 0.1655      # α₀ [kg m⁻³ K⁻¹] (ρ-based)
    haline_contraction: float = 0.7655     # β₀ [kg m⁻³ (g/kg)⁻¹]
    cabbeling: float = 0.011               # Cᵇ [kg m⁻³ K⁻²]
    thermobaricity: float = 2.5e-5         # Tʰ [kg m⁻³ K⁻¹ m⁻¹]
    reference_temperature: float = 10.0
    reference_salinity: float = 35.0
    reference_density: float = 1026.0

    def density_anomaly(self, T, S, z):
        dT = T - self.reference_temperature
        dS = S - self.reference_salinity
        return (-self.thermal_expansion * dT
                - 0.5 * self.cabbeling * dT * dT
                - self.thermobaricity * dT * z
                + self.haline_contraction * dS)


@dataclasses.dataclass(frozen=True)
class PolynomialEquationOfState:
    """ρ′ = Σ_{(i,j,k)} c_{ijk} Θⁱ Sʲ zᵏ (coefficients are a dict)."""

    coefficients: Tuple[Tuple[Tuple[int, int, int], float], ...]
    reference_density: float = 1026.0

    @classmethod
    def from_dict(cls, coeffs: Dict, reference_density=1026.0):
        return cls(tuple(sorted(coeffs.items())), reference_density)

    def density_anomaly(self, T, S, z):
        rho = 0.0
        for (i, j, k), c in self.coefficients:
            term = c
            if i:
                term = term * T ** i
            if j:
                term = term * S ** j
            if k:
                term = term * z ** k
            rho = rho + term
        return rho
