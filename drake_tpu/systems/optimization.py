"""systems/optimization: expose system structure to MathematicalProgram.

Reference: systems/optimization/system_constraint_adapter.h,
system_constraint_wrapper.h — wrap a SystemConstraint declared on a System
as a solvers::Constraint so a MathematicalProgram can optimize over
(state, input, params) of that system.

Here a "system constraint" is any jax-traceable function of the system's
(x, u) (the functional SystemConstraint role), and the adapter produces the
generic-constraint record the drake_tpu MathematicalProgram consumes —
jax.grad/jacfwd supply the derivatives the reference gets from AutoDiffXd.
Also provides the common fixed-point helpers (find an equilibrium /
trim point), the reference's most frequent use of the adapter.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.solvers.program import MathematicalProgram, Variables


def add_system_constraint(
    prog: MathematicalProgram,
    system,
    constraint: Callable,  # (params, x, u, t) -> residual vector
    x_var: Variables,
    u_var: Variables,
    lb,
    ub,
    params=None,
    t: float = 0.0,
) -> None:
    """Bind lb <= constraint(params, x, u, t) <= ub over (x_var, u_var).

    The two blocks must be contiguous in the program (allocate them
    back-to-back), matching the flat-z design of drake_tpu's program
    container; raises otherwise.
    """
    if x_var.start + x_var.size != u_var.start:
        raise ValueError(
            "x_var and u_var must be contiguous blocks (allocate u right "
            "after x)")
    joint = Variables(x_var.start, x_var.size + u_var.size,
                      f"{x_var.name}+{u_var.name}")
    nx = x_var.size
    p = system.default_params if params is None else params

    def fn(z):
        return jnp.atleast_1d(constraint(p, z[:nx], z[nx:], t))

    prog.AddConstraint(fn, lb, ub, joint)


def add_equilibrium_constraint(
    prog: MathematicalProgram,
    system,
    x_var: Variables,
    u_var: Variables,
    params=None,
    t: float = 0.0,
) -> None:
    """Constrain (x, u) to be a fixed point: f(x, u) = 0 for continuous
    systems, g(x, u) = x for discrete ones."""
    if hasattr(system, "f"):
        def resid(p, x, u, tt):
            return system.f(p, x, u, tt)
    else:
        def resid(p, x, u, tt):
            return system.g(p, x, u, tt) - x
    n = system.num_states
    add_system_constraint(
        prog, system, resid, x_var, u_var,
        lb=np.zeros(n), ub=np.zeros(n), params=params, t=t)


def find_fixed_point(
    system,
    x_guess,
    u_guess,
    params=None,
    x_cost_weight: float = 0.0,
    u_cost_weight: float = 1e-3,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Solve for an equilibrium near the guess (the FixedPoint/trim role).

    Returns (x*, u*, success).  Small regularizing costs keep the NLP
    well-posed when the equilibrium manifold is not a point.
    """
    x_guess = np.asarray(x_guess, float)
    u_guess = np.asarray(u_guess, float)
    prog = MathematicalProgram()
    x = prog.NewContinuousVariables(x_guess.size, "x")
    u = prog.NewContinuousVariables(u_guess.size, "u")
    add_equilibrium_constraint(prog, system, x, u, params=params)
    if x_cost_weight > 0:
        prog.AddQuadraticErrorCost(
            x_cost_weight * np.eye(x_guess.size), x_guess, x)
    if u_cost_weight > 0:
        prog.AddQuadraticErrorCost(
            u_cost_weight * np.eye(u_guess.size), u_guess, u)
    prog.SetInitialGuess(x, x_guess)
    prog.SetInitialGuess(u, u_guess)
    res = prog.Solve()
    return res.GetSolution(x), res.GetSolution(u), res.is_success()
