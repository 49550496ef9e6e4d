"""Simulation: lax.scan rollouts replacing Simulator::AdvanceTo.

Drake advances a hybrid system with an event-dispatch loop
(reference: systems/analysis/simulator.cc:279 AdvanceTo).  The TPU-native
equivalent compiles the whole rollout: fixed-step integration under
``jax.lax.scan`` (one XLA while loop, fully fused), ``jax.vmap`` for batched
rollouts (replacing the thread-pool BatchEval* of systems/analysis/
batch_eval.h:48,89), and an error-controlled Dormand-Prince driver under
``lax.while_loop`` for the adaptive path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from drake_tpu.systems import integrators as _integrators
from drake_tpu.systems.base import ContinuousSystem, DiscreteSystem


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
    """Mirror of drake::systems::SimulatorConfig (YAML-able; see io.config)."""

    integration_scheme: str = "rk4"
    max_step_size: float = 0.01
    accuracy: float = 1e-4
    use_error_control: bool = False


def simulate(
    system: ContinuousSystem,
    params,
    x0,
    u_sequence,
    dt,
    t0=0.0,
    method: str = "rk4",
):
    """Roll out a control sequence with fixed steps.

    Args:
      u_sequence: (N, num_inputs) — one input per step (zero-order hold).
    Returns:
      (xs, ts): xs is (N+1, num_states) including x0; ts is (N+1,).
    """
    step = _integrators.get(method)
    n = u_sequence.shape[0]

    def body(carry, u):
        x, t = carry
        x_next = step(system.f, params, x, u, t, dt)
        return (x_next, t + dt), x_next

    (_, _), xs = jax.lax.scan(body, (x0, jnp.asarray(t0, x0.dtype)), u_sequence)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    ts = t0 + dt * jnp.arange(n + 1, dtype=x0.dtype)
    return xs, ts


def simulate_controlled(
    system: ContinuousSystem,
    params,
    x0,
    policy: Callable,
    num_steps: int,
    dt,
    t0=0.0,
    method: str = "rk4",
    policy_state=None,
):
    """Closed-loop rollout: u = policy(policy_state, x, t) each step.

    ``policy`` may return either ``u`` or ``(u, new_policy_state)``.
    Returns (xs, us, ts).
    """
    step = _integrators.get(method)

    def body(carry, _):
        x, t, ps = carry
        out = policy(ps, x, t)
        if isinstance(out, tuple):
            u, ps_next = out
        else:
            u, ps_next = out, ps
        x_next = step(system.f, params, x, u, t, dt)
        return (x_next, t + dt, ps_next), (x_next, u)

    (xf, tf, _), (xs, us) = jax.lax.scan(
        body, (x0, jnp.asarray(t0, x0.dtype), policy_state), None, length=num_steps
    )
    xs = jnp.concatenate([x0[None], xs], axis=0)
    ts = t0 + dt * jnp.arange(num_steps + 1, dtype=x0.dtype)
    return xs, us, ts


def simulate_discrete(system: DiscreteSystem, params, x0, u_sequence, t0=0.0):
    """Roll out a discrete system over a control sequence."""
    h = system.time_step

    def body(carry, u):
        x, t = carry
        x_next = system.g(params, x, u, t)
        return (x_next, t + h), x_next

    (_, _), xs = jax.lax.scan(body, (x0, jnp.asarray(t0, x0.dtype)), u_sequence)
    return jnp.concatenate([x0[None], xs], axis=0)


def batch_simulate(system, params, x0_batch, u_batch, dt, method: str = "rk4"):
    """vmap-batched rollouts: the SPMD replacement for BatchEval/MonteCarlo.

    x0_batch: (B, nx); u_batch: (B, N, nu).  Shard the batch axis over a mesh
    with jax.sharding for multi-chip scaling (see drake_tpu.parallel).
    """
    return jax.vmap(lambda x0, us: simulate(system, params, x0, us, dt, method=method))(
        x0_batch, u_batch
    )


def simulate_adaptive(
    system: ContinuousSystem,
    params,
    x0,
    u_fn: Callable,
    t_final,
    t0=0.0,
    accuracy: float = 1e-6,
    h0: float = 1e-3,
    h_min: float = 1e-9,
    h_max: float = 1.0,
    max_steps: int = 100_000,
):
    """Error-controlled Dormand-Prince 5(4) to t_final inside jit.

    The step-size controller is the standard PI-free accept/reject rule Drake's
    IntegratorBase uses (error-ratio^(1/5) with safety factor). ``u_fn(t, x)``
    supplies the input. Returns (x_final, stats dict).
    """
    safety = 0.9

    def err_norm(err, x, x_new):
        scale = accuracy + accuracy * jnp.maximum(jnp.abs(x), jnp.abs(x_new))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    def cond(state):
        t, x, h, steps, rejects = state
        return jnp.logical_and(t < t_final, steps < max_steps)

    def body(state):
        t, x, h, steps, rejects = state
        h_eff = jnp.minimum(h, t_final - t)
        u = u_fn(t, x)
        x_new, err = _integrators.step_error_controlled(
            system.f, params, x, u, t, h_eff
        )
        e = err_norm(err, x, x_new)
        accept = e <= 1.0
        factor = safety * jnp.where(e > 0, e ** (-0.2), 5.0)
        factor = jnp.clip(factor, 0.2, 5.0)
        h_next = jnp.clip(h_eff * factor, h_min, h_max)
        t = jnp.where(accept, t + h_eff, t)
        x = jnp.where(accept, x_new, x)
        return (t, x, h_next, steps + 1, rejects + (~accept).astype(jnp.int32))

    t0 = jnp.asarray(t0, x0.dtype)
    state = (t0, x0, jnp.asarray(h0, x0.dtype), jnp.array(0), jnp.array(0))
    t, x, h, steps, rejects = jax.lax.while_loop(cond, body, state)
    return x, {"num_steps": steps, "num_rejected": rejects, "final_time": t}


# ---------------------------------------------------------------------------
# Hybrid simulation: witness functions + state resets.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WitnessFunction:
    """A state-triggered event (reference systems/framework/
    witness_function.h + the isolation loop simulator.cc:51-55,224).

    ``g(params, x, t) -> scalar``: the event fires when g crosses zero in
    ``direction`` within a step; the crossing is isolated by fixed-count
    bisection (compiler-friendly replacement for Drake's tolerance-driven
    loop) and ``reset(params, x, t) -> x_new`` is applied at the event.

    direction: "positive_then_negative" | "negative_then_positive" |
    "crosses_zero".
    """

    g: Callable
    reset: Callable
    direction: str = "positive_then_negative"

    def triggered(self, g0, g1):
        if self.direction == "positive_then_negative":
            return jnp.logical_and(g0 > 0, g1 <= 0)
        if self.direction == "negative_then_positive":
            return jnp.logical_and(g0 < 0, g1 >= 0)
        return jnp.sign(g0) * jnp.sign(g1) < 0


def simulate_hybrid(
    system: ContinuousSystem,
    params,
    x0,
    t_final: float,
    dt: float,
    witnesses,
    u_fn: Optional[Callable] = None,  # (params, x, t) -> u
    method: str = "rk4",
    bisection_iters: int = 24,
):
    """Fixed-macro-step rollout with witness isolation and resets.

    Each macro step integrates dt, checks every witness for a sign change,
    bisects the EARLIEST crossing to dt/2^bisection_iters resolution,
    applies that witness's reset there, and integrates the remainder of the
    step from the post-reset state.  One event per macro step (Drake
    handles simultaneous events by per-step dispatch too); pick dt small
    enough that events don't pile up.  jit/vmap/grad-compatible: the event
    machinery is lax.cond/where only.

    Returns (xs (N+1, nx), ts (N+1,), event_counts (n_witness,)).
    """
    witnesses = tuple(witnesses)
    step = _integrators.get(method)
    nstep = int(round(t_final / dt))
    dtype = x0.dtype

    def u_of(x, t):
        if u_fn is None:
            return jnp.zeros(system.num_inputs, dtype)
        return u_fn(params, x, t)

    def integrate(x, t, h):
        return step(system.f, params, x, u_of(x, t), t, h)

    def macro(carry, _):
        x, t, counts = carry
        x1 = integrate(x, t, dt)
        g0s = jnp.stack([w.g(params, x, t) for w in witnesses])
        g1s = jnp.stack([w.g(params, x1, t + dt) for w in witnesses])
        trig = jnp.stack(
            [w.triggered(g0s[i], g1s[i]) for i, w in enumerate(witnesses)]
        )

        def isolate(i):
            """Bisect the crossing fraction alpha of witness i in [0, 1]."""

            def body(carry2, _):
                lo, hi = carry2
                mid = 0.5 * (lo + hi)
                xm = integrate(x, t, mid * dt)
                gm = jax.lax.switch(
                    i, [lambda xx, tt, w=w: w.g(params, xx, tt)
                        for w in witnesses], xm, t + mid * dt
                )
                # Crossing is between lo and mid iff the sign already
                # changed relative to the step start.
                crossed = jnp.sign(g0s[i]) * jnp.sign(gm) <= 0
                lo = jnp.where(crossed, lo, mid)
                hi = jnp.where(crossed, mid, hi)
                return (lo, hi), ()

            (lo, hi), _ = jax.lax.scan(
                body,
                (jnp.asarray(0.0, dtype), jnp.asarray(1.0, dtype)),
                None,
                length=bisection_iters,
            )
            return hi

        alphas = jnp.stack(
            [jnp.where(trig[i], isolate(i), jnp.asarray(jnp.inf, dtype))
             for i in range(len(witnesses))]
        )
        any_trig = jnp.any(trig)
        first = jnp.argmin(alphas)
        alpha = jnp.where(any_trig, jnp.min(alphas), 1.0)

        def handle(_):
            t_ev = t + alpha * dt
            x_ev = integrate(x, t, alpha * dt)
            x_reset = jax.lax.switch(
                first,
                [lambda xx, tt, w=w: w.reset(params, xx, tt)
                 for w in witnesses],
                x_ev, t_ev,
            )
            return integrate(x_reset, t_ev, (1.0 - alpha) * dt)

        x_next = jax.lax.cond(any_trig, handle, lambda _: x1, None)
        counts = counts + jnp.where(
            jnp.arange(len(witnesses)) == first, any_trig, False
        ).astype(jnp.int32)
        return (x_next, t + dt, counts), x_next

    counts0 = jnp.zeros(len(witnesses), jnp.int32)
    (xf, tf, counts), xs = jax.lax.scan(
        macro, (x0, jnp.asarray(0.0, dtype), counts0), None, length=nstep
    )
    xs = jnp.concatenate([x0[None], xs], axis=0)
    ts = dt * jnp.arange(nstep + 1, dtype=dtype)
    return xs, ts, counts


def dense_output(system: ContinuousSystem, params, xs, ts, us):
    """C1 Hermite interpolant of a simulation trace (dense output).

    The reference's HermitianDenseOutput (systems/analysis/
    hermitian_dense_output.h): integrators append (t, x, xdot) steps and the
    trajectory is queried at arbitrary times afterwards.  Here the knot
    derivatives are recomputed exactly from the dynamics (one vmapped f
    evaluation over the trace) and the interpolant is the existing
    PiecewisePolynomial.cubic_hermite — jit/vmap-friendly evaluation.

    Args:
      xs: (N+1, nx) states from simulate(); ts: (N+1,); us: (N, nu) ZOH
        inputs (the last input is held for the final knot).
    Returns a PiecewisePolynomial over [ts[0], ts[-1]].
    """
    from drake_tpu.math.trajectories import PiecewisePolynomial

    us_knots = jnp.concatenate([us, us[-1:]], axis=0)
    xdots = jax.vmap(lambda x, u, t: system.f(params, x, u, t))(
        xs, us_knots, ts
    )
    return PiecewisePolynomial.cubic_hermite(ts, xs, xdots)
