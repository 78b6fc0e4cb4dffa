"""Time steppers: low-storage RK3 and quasi-Adams-Bashforth-2.

Pure-function re-design of /root/reference/src/TimeSteppers/:
``state' = step(state, Δt)`` with tendencies carried in the state pytree,
the whole step traced under one jit.

* RK3: Le-Moin low-storage table γ=(8/15, 5/12, 3/4), ζ=(0, −17/60, −5/12)
  (runge_kutta_3.jl:57-66); stage clock ticks by (γᵐ+ζᵐ)Δt.
* QAB2: u ← u + Δt((3/2+χ)Gⁿ − (1/2+χ)G⁻) with χ=0.1; falls back to a
  forward-Euler step whenever Δt changed or at iteration 0
  (quasi_adams_bashforth_2.jl:6-12, 70-104). The "euler if Δt changed"
  branch is a `lax.cond`-free arithmetic select on `previous_dt` carried
  in the state, preserving exact AB2 restart semantics under jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Clock:
    """time/iteration/stage counters (reference TimeSteppers/clock.jl)."""

    time: jnp.ndarray = 0.0
    iteration: jnp.ndarray = 0
    stage: int = 0

    def tick(self, dt, stage=False):
        if stage:
            return Clock(self.time + dt, self.iteration, self.stage + 1)
        return Clock(self.time + dt, self.iteration + 1, 0)

    def tree_flatten(self):
        return (self.time, self.iteration), (self.stage,)

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(leaves[0], leaves[1], static[0])


RK3_GAMMA = (8.0 / 15.0, 5.0 / 12.0, 3.0 / 4.0)
RK3_ZETA = (0.0, -17.0 / 60.0, -5.0 / 12.0)


def rk3_substep(fields, G, G_prev, dt, gamma, zeta):
    """uᵐ⁺¹ = uᵐ + Δt(γᵐ Gᵐ + ζᵐ Gᵐ⁻¹) over a pytree of prognostic fields."""
    if zeta == 0.0 or G_prev is None:
        return jax.tree_util.tree_map(lambda u, g: u + dt * gamma * g, fields, G)
    return jax.tree_util.tree_map(
        lambda u, g, gp: u + dt * (gamma * g + zeta * gp), fields, G, G_prev)


def ab2_substep(fields, G, G_prev, dt, chi, euler):
    """AB2 update with a traced `euler` flag selecting the forward-Euler
    branch (χ effectively −1/2 ⇒ pure Euler) — reference ab2_step_field!
    (quasi_adams_bashforth_2.jl:158-166 + :74-87)."""
    chi = jnp.where(euler, -0.5, chi)
    c1 = 1.5 + chi
    c2 = 0.5 + chi

    def upd(u, g, gp):
        return u + dt * (c1 * g - c2 * gp)

    return jax.tree_util.tree_map(upd, fields, G, G_prev)
