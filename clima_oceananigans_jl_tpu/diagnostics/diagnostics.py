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
    """CFL_diff = Δt / cell_diffusion_timescale (reference cfl.jl:29-46);
    accounts for every closure in the tuple, LES diffusivity fields, and
    vertically-implicit discretizations (which do not limit)."""

    def __init__(self, dt=None):
        self.dt = dt

    def __call__(self, sim):
        scale = float(sim.model.cell_diffusion_timescale(sim.state))
        dt = sim.dt if self.dt is None else self.dt
        return 0.0 if scale == float("inf") else float(dt / scale)


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
