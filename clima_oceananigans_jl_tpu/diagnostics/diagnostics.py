"""Diagnostics: CFL numbers and state checking.

Port of /root/reference/src/Diagnostics/ (cfl.jl:9-46, state_checker.jl).
"""
from __future__ import annotations

import logging

import jax.numpy as jnp

logger = logging.getLogger("clima_oceananigans_jl_tpu")


class AdvectiveCFL:
    """CFL = Δt / cell_advection_timescale (reference cfl.jl:9-27)."""

    def __init__(self, dt=None):
        self.dt = dt

    def __call__(self, sim_or_model, state=None, dt=None):
        if state is None:  # called with a Simulation
            sim = sim_or_model
            model, state = sim.model, sim.state
            dt = sim.dt if dt is None else dt
        else:
            model = sim_or_model
            dt = self.dt if dt is None else dt
        return float(dt / model.cell_advection_timescale(state))


CFL = AdvectiveCFL


class DiffusiveCFL:
    """CFL_diff = Δt · ν / min(Δ)² (reference cfl.jl:29-46)."""

    def __init__(self, dt=None):
        self.dt = dt

    def __call__(self, sim):
        model = sim.model
        closure = getattr(model, "closure", None)
        if closure is None:
            return 0.0
        nu = getattr(closure, "nu", 0.0)
        nu = float(jnp.max(jnp.asarray(nu))) if not isinstance(nu, dict) else \
            max(float(jnp.max(jnp.asarray(v))) for v in nu.values())
        d = model.grid.min_spacing()
        return float(sim.dt * nu / d ** 2)


class StateChecker:
    """Logs |min| |max| mean of every prognostic field
    (reference state_checker.jl)."""

    def __call__(self, sim):
        sol = sim.state.get("solution", {})
        parts = []
        for name, arr in sol.items():
            v = sim.model.grid.interior(arr)
            parts.append(f"{name}: min={float(jnp.min(v)):+.6e} "
                         f"max={float(jnp.max(v)):+.6e} "
                         f"mean={float(jnp.mean(v)):+.6e}")
        logger.info("[state] it=%d t=%.6g | %s", sim.model_iteration(),
                    sim.model_time(), " | ".join(parts))
