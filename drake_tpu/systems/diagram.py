"""System composition combinators — the Diagram/DiagramBuilder role.

Drake wires systems into a Diagram with ports and a builder (reference:
systems/framework/diagram_builder.h); under JAX composition is function
composition, so the combinator set is small and explicit:

  - ``cascade(sys1, sys2)``: sys1's output feeds sys2's input (series).
  - ``feedback(plant, controller)``: u = controller(y) closes the loop
    (the PidControlledSystem wiring shape, pid_controlled_system.h).
  - ``parallel_compose(a, b)``: independent states side by side.

Composed systems carry tupled params pytrees: params = (params1, params2).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from drake_tpu.systems.base import ContinuousSystem


def _output_of(system: ContinuousSystem):
    if system.output is not None:
        return system.output
    return lambda params, x, u, t: x  # default full-state output


def cascade(sys1: ContinuousSystem, sys2: ContinuousSystem) -> ContinuousSystem:
    """Series connection: u -> sys1 -> sys2 -> y.  State x = [x1; x2]."""
    n1 = sys1.num_states
    out1 = _output_of(sys1)
    out2 = _output_of(sys2)

    def f(params, x, u, t=0.0):
        p1, p2 = params
        x1, x2 = x[..., :n1], x[..., n1:]
        y1 = out1(p1, x1, u, t)
        dx1 = sys1.f(p1, x1, u, t)
        dx2 = sys2.f(p2, x2, y1, t)
        return jnp.concatenate([dx1, dx2], axis=-1)

    def output(params, x, u, t=0.0):
        p1, p2 = params
        x1, x2 = x[..., :n1], x[..., n1:]
        y1 = out1(p1, x1, u, t)
        return out2(p2, x2, y1, t)

    return ContinuousSystem(
        f=f,
        num_states=n1 + sys2.num_states,
        num_inputs=sys1.num_inputs,
        output=output,
        default_params=(sys1.default_params, sys2.default_params),
    )


def feedback(
    plant: ContinuousSystem,
    controller: Callable,
    reference_input: bool = True,
) -> ContinuousSystem:
    """Close the loop: u_plant = controller(params, y_plant, r, t).

    ``controller`` is a memoryless function (stateful controllers compose via
    cascade of an observer/integrator system).  The composed system's input
    is the reference r (or nothing if reference_input=False).
    """
    out = _output_of(plant)
    nu = plant.num_inputs

    def f(params, x, r, t=0.0):
        # Output evaluated at zero input: direct-feedthrough loops are not
        # supported (Drake's DiagramBuilder rejects algebraic loops too).
        y = out(params, x, jnp.zeros(x.shape[:-1] + (nu,), x.dtype), t)
        u = controller(params, y, r, t)
        return plant.f(params, x, u, t)

    return ContinuousSystem(
        f=f,
        num_states=plant.num_states,
        num_inputs=plant.num_inputs if reference_input else 0,
        output=plant.output,
        default_params=plant.default_params,
    )


def parallel_compose(a: ContinuousSystem, b: ContinuousSystem) -> ContinuousSystem:
    """Two independent systems side by side: x=[xa;xb], u=[ua;ub]."""
    na, ma = a.num_states, a.num_inputs

    def f(params, x, u, t=0.0):
        pa, pb = params
        dxa = a.f(pa, x[..., :na], u[..., :ma], t)
        dxb = b.f(pb, x[..., na:], u[..., ma:], t)
        return jnp.concatenate([dxa, dxb], axis=-1)

    return ContinuousSystem(
        f=f,
        num_states=na + b.num_states,
        num_inputs=ma + b.num_inputs,
        default_params=(a.default_params, b.default_params),
    )
