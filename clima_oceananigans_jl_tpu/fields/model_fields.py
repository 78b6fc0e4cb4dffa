"""Named diagnostic field constructors.

Parity for the reference's exported convenience fields
(/root/reference/src/Oceananigans.jl:40-44: BuoyancyField, PressureField;
src/BuoyancyModels/buoyancy_field.jl, src/Fields/pressure_field.jl).
Here they are plain functions of (model, state) returning center-located
``Field`` views — the lazy/reactive machinery of the reference collapses
under jit (recompute-on-read is free when the whole step is one traced
function).
"""
from __future__ import annotations

from ..utils.location import CENTER
from .field import Field


def BuoyancyField(model, state):
    """Buoyancy perturbation diagnostic at cell centers (reference
    BuoyancyField(model)). For BuoyancyTracer this is the ``b`` tracer;
    for SeawaterBuoyancy it is computed from T/S via the model's equation
    of state."""
    if model.buoyancy is None:
        raise ValueError("model has no buoyancy")
    sol = state["solution"]
    tracers = {n: sol[n] for n in model.tracer_names}
    return Field(model.buoyancy.buoyancy_perturbation(model.grid, tracers),
                 CENTER)


def PressureField(model, state):
    """Total kinematic pressure pHY′ + pNHS at cell centers (reference
    PressureField(model) = sum of hydrostatic-anomaly and nonhydrostatic
    solver pressures)."""
    p = None
    for key in ("pHY", "pNHS"):
        if key in state:
            p = state[key] if p is None else p + state[key]
    if p is None:
        raise ValueError("state carries no pressure fields")
    return Field(p, CENTER)
