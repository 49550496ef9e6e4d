"""MPPI: model-predictive path integral control (sampling-based MPC).

The reference's contact-rich MPC pipeline couples a GPU MPM solver with
rigid SAP contact (arXiv:2503.05046; deformable_driver.h:221-270) — state
dimension there is tens of thousands (particle x/v/F/C), which rules out
Riccati-style MPC (iLQR jacobians over the particle state are both huge
and nonsmooth through contact).  The standard answer — and the TPU-native
one — is sampling MPC: perturb the control sequence, roll out a BATCH of
full coupled simulations (vmap over the scenario axis, scan over the
horizon — exactly what the chip is good at), and exponentially reweight
(Williams et al., "Information Theoretic MPC", ICRA 2017).

Works with ANY pytree state and any jittable dynamics `f(state, u) ->
state` — including `CoupledWorld.step` — because it never differentiates
the dynamics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MppiOptions:
    num_samples: int = 64  # K rollouts per solve
    temperature: float = 1.0  # lambda: lower = greedier reweighting
    noise_sigma: float = 1.0  # control perturbation std (scalar or (nu,))
    smoothing: float = 0.0  # exponential smoothing across the horizon
    u_lower: Any = None  # optional (nu,) clamp
    u_upper: Any = None


class MppiResult(NamedTuple):
    u_traj: jnp.ndarray  # (H, nu) updated nominal control sequence
    cost: jnp.ndarray  # () weighted-average rollout cost
    best_cost: jnp.ndarray  # () best single rollout


def _rollout_cost(dynamics, running_cost, final_cost, state0, us):
    """Total cost of one control sequence from state0 (scan, no gradients)."""

    def body(carry, u):
        state, acc = carry
        c = running_cost(state, u)
        nxt = dynamics(state, u)
        return (nxt, acc + c), None

    dtype = us.dtype
    zero = jnp.zeros((), dtype)
    (state_T, acc), _ = jax.lax.scan(body, (state0, zero), us)
    return acc + jnp.asarray(final_cost(state_T), dtype)


def mppi_step(
    dynamics: Callable,
    running_cost: Callable,
    final_cost: Callable,
    state0,
    u_nominal,
    key,
    options: MppiOptions = MppiOptions(),
) -> MppiResult:
    """One MPPI update of the nominal control sequence.

    dynamics: (state_pytree, u (nu,)) -> state_pytree, jittable.
    running_cost: (state, u) -> scalar;  final_cost: state -> scalar.
    u_nominal: (H, nu).  Returns the reweighted sequence (same shape).
    """
    H, nu = u_nominal.shape
    K = options.num_samples
    sigma = jnp.broadcast_to(
        jnp.asarray(options.noise_sigma, u_nominal.dtype), (nu,)
    )

    eps = jax.random.normal(key, (K, H, nu), u_nominal.dtype) * sigma
    if options.smoothing > 0.0:
        b = options.smoothing

        def smooth(carry, e):
            carry = b * carry + (1.0 - b) * e
            return carry, carry

        _, eps_s = jax.vmap(
            lambda e: jax.lax.scan(smooth, jnp.zeros(nu, e.dtype), e)
        )(eps)
        eps = eps_s
    us = u_nominal[None] + eps  # (K, H, nu)
    if options.u_lower is not None:
        lo = jnp.asarray(options.u_lower, u_nominal.dtype)
        hi = jnp.asarray(options.u_upper, u_nominal.dtype)
        us = jnp.clip(us, lo, hi)

    costs = jax.vmap(
        lambda u: _rollout_cost(dynamics, running_cost, final_cost, state0, u)
    )(us)  # (K,)

    beta = jnp.min(costs)
    w = jnp.exp(-(costs - beta) / options.temperature)
    w = w / (jnp.sum(w) + 1e-12)
    u_new = jnp.einsum("k,khu->hu", w, us).astype(u_nominal.dtype)
    return MppiResult(
        u_traj=u_new, cost=jnp.sum(w * costs), best_cost=beta
    )


def mppi_mpc_rollout(
    dynamics: Callable,
    running_cost: Callable,
    final_cost: Callable,
    state0,
    u_init,
    key,
    num_steps: int,
    options: MppiOptions = MppiOptions(),
    iterations_per_step: int = 1,
):
    """Receding-horizon MPPI: at each step refine the nominal sequence,
    apply its first control, shift (warm start).  Returns (states pytree
    stacked over time, applied controls (num_steps, nu), costs)."""

    def solve(state, u_nom, k):
        def it(carry, kk):
            res = mppi_step(
                dynamics, running_cost, final_cost, state, carry, kk, options
            )
            return res.u_traj, res.best_cost

        keys = jax.random.split(k, iterations_per_step)
        u_nom, bc = jax.lax.scan(it, u_nom, keys)
        return u_nom, bc[-1]

    def body(carry, k):
        state, u_nom = carry
        u_nom, best = solve(state, u_nom, k)
        u0 = u_nom[0]
        nxt = dynamics(state, u0)
        u_shift = jnp.concatenate([u_nom[1:], u_nom[-1:]], axis=0)
        return (nxt, u_shift), (nxt, u0, best)

    keys = jax.random.split(key, num_steps)
    (_, _), (states, us, costs) = jax.lax.scan(body, (state0, u_init), keys)
    return states, us, costs
