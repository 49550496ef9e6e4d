"""The system abstraction: pure dynamics functions instead of System<T>.

Drake's ``System<T>``/``Context<T>``/``LeafSystem`` machinery
(reference: systems/framework/system.h:42, context.h:35) exists to give C++
introspection, caching, and scalar conversion.  Under JAX those jobs are done
by the tracer: a "system" here is just a pure function

    f(params, x, u, t) -> xdot            (continuous dynamics)
    g(params, x, u, t) -> x_next          (discrete update)

bundled with its signature metadata.  ``jax.grad``/``jax.jacfwd`` replace
AutoDiffXd (system.h:1251 ToAutoDiffXd), ``jax.vmap`` replaces per-thread
Context clones (systems/analysis/batch_eval.h), and jit tracing replaces the
symbolic::Expression scalar.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray
DynamicsFn = Callable[[Any, Array, Array, Array], Array]


@dataclasses.dataclass(frozen=True)
class ContinuousSystem:
    """A continuous-time system dx/dt = f(params, x, u, t).

    Optional ``output`` defaults to full-state output (like the baseline
    example plants' state output ports).
    """

    f: DynamicsFn
    num_states: int
    num_inputs: int
    default_params: Any = None
    output: Optional[Callable[[Any, Array, Array, Array], Array]] = None
    # Optional second-order structure: x = [q; v] with nq + nv = num_states.
    num_q: Optional[int] = None
    num_v: Optional[int] = None

    def __call__(self, params, x, u, t=0.0):
        return self.f(params, x, u, t)

    def linearize(self, params, x0, u0, t0=0.0):
        """(A, B) of the Jacobian linearization about (x0, u0).

        Functional replacement for drake::systems::Linearize
        (systems/primitives/linear_system.h) — jacfwd instead of AutoDiffXd.
        """
        A = jax.jacfwd(lambda x: self.f(params, x, u0, t0))(x0)
        B = jax.jacfwd(lambda u: self.f(params, x0, u, t0))(u0)
        return A, B

    def with_params(self, params):
        return dataclasses.replace(self, default_params=params)


@dataclasses.dataclass(frozen=True)
class DiscreteSystem:
    """A discrete-time system x[k+1] = g(params, x[k], u[k], t[k]), period h."""

    g: DynamicsFn
    num_states: int
    num_inputs: int
    time_step: float
    default_params: Any = None
    output: Optional[Callable[[Any, Array, Array, Array], Array]] = None

    def __call__(self, params, x, u, t=0.0):
        return self.g(params, x, u, t)

    def linearize(self, params, x0, u0, t0=0.0):
        A = jax.jacfwd(lambda x: self.g(params, x, u0, t0))(x0)
        B = jax.jacfwd(lambda u: self.g(params, x0, u, t0))(u0)
        return A, B


def discretize(system: ContinuousSystem, time_step: float, method: str = "rk4"):
    """Wrap a continuous system into a fixed-step discrete one."""
    from drake_tpu.systems import integrators

    step = integrators.get(method)

    def g(params, x, u, t):
        return step(system.f, params, x, u, t, time_step)

    return DiscreteSystem(
        g=g,
        num_states=system.num_states,
        num_inputs=system.num_inputs,
        time_step=time_step,
        default_params=system.default_params,
        output=system.output,
    )
