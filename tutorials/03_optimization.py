"""Tutorial 3: the optimization layer — symbolic programs to trajectory opt.

The drake_tpu analog of the reference's MathematicalProgram tutorials
(tutorials/mathematical_program.ipynb): declare decision variables, pose
costs/constraints (symbolically or as jax functions), and let Solve()
classify + dispatch (QP -> interior point; NLP -> SQP/augmented-Lagrangian).

Run:  python tutorials/03_optimization.py     (CPU f64, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# 1. Symbolic expressions (common/symbolic role).  Build costs/constraints
#    declaratively, extract exact structure, or compile them to JAX.
# ---------------------------------------------------------------------------
from drake_tpu.math import symbolic as sym

x, y = sym.Variable("x"), sym.Variable("y")
e = (x + 2 * y) ** 2 + sym.sin(x)
print(f"expression:      {e}")
print(f"d e / d x:       {e.Differentiate(x)}")
A, b = sym.decompose_affine_expressions([2 * x - y + 1, x + 3], [x, y])
print(f"affine decompose: A={A.tolist()} b={b.tolist()}")

f = sym.to_jax(e, [x, y])  # codegen: XLA compiles the tree
print(f"compiled eval at (0.3, -0.1): {float(jax.jit(f)(jnp.asarray([0.3, -0.1]))):.6f}")

# ---------------------------------------------------------------------------
# 2. A QP through MathematicalProgram.  Typed Add* calls declare structure;
#    Solve() sees only linear/quadratic records and dispatches to the
#    Mehrotra interior-point QP (the OSQP role).
# ---------------------------------------------------------------------------
from drake_tpu.solvers.program import MathematicalProgram

prog = MathematicalProgram()
v = prog.NewContinuousVariables(2, "v")
prog.AddQuadraticCost(np.eye(2) * 2.0, np.zeros(2), v)  # |v|^2
prog.AddLinearConstraint(np.array([[1.0, 1.0]]), [1.0], [np.inf], v)
res = prog.Solve()
print(f"QP: min |v|^2 s.t. v0+v1 >= 1  ->  v = {res.GetSolution(v)} "
      f"(exact: [0.5, 0.5])")
assert np.allclose(res.GetSolution(v), [0.5, 0.5], atol=1e-6)

# ---------------------------------------------------------------------------
# 3. An NLP: generic (jax-traceable) costs/constraints promote the program
#    to the SQP path (the SNOPT role).  Find the point on a circle closest
#    to a target.
# ---------------------------------------------------------------------------
prog2 = MathematicalProgram()
p = prog2.NewContinuousVariables(2, "p")
target = np.array([2.0, 1.0])
prog2.AddCost(lambda z: jnp.sum((z - target) ** 2), p)
prog2.AddConstraint(lambda z: jnp.sum(z * z), 1.0, 1.0, p)  # on unit circle
prog2.SetInitialGuess(p, np.array([1.0, 0.0]))
res2 = prog2.Solve()
sol = res2.GetSolution(p)
expect = target / np.linalg.norm(target)
print(f"NLP: closest point on circle to {target.tolist()} -> {sol} "
      f"(exact {expect.round(4).tolist()})")
assert np.allclose(sol, expect, atol=1e-4)

# ---------------------------------------------------------------------------
# 4. Trajectory optimization: direct collocation on the pendulum
#    (planning/trajectory_optimization/direct_collocation.h role) — the
#    baseline config the reference's pendulum example ships.
# ---------------------------------------------------------------------------
from drake_tpu.models import pendulum
from drake_tpu.trajopt import dircol

params = pendulum.default_params(jnp.float64)
system = pendulum.make_system(params)
x0 = jnp.zeros(2)
xf = jnp.asarray([np.pi, 0.0])
problem = dircol.DircolProblem(
    system=system,
    num_time_samples=21,
    minimum_time_step=0.2,
    maximum_time_step=0.5,
    running_cost=lambda x, u: 10.0 * u[0] ** 2,
    x0=x0,
    xf=xf,
    u_lower=jnp.asarray([-3.0]),
    u_upper=jnp.asarray([3.0]),
)
z_init = problem.initial_guess(x0, xf, timespan=4.0, dtype=jnp.float64)
sol = jax.jit(lambda z: dircol.solve(problem, params, z))(z_init)
print(f"dircol: success={bool(sol.success)} "
      f"final state {np.asarray(sol.xs[-1]).round(4)} (target [pi, 0]) "
      f"cost {float(sol.cost):.3f}")
assert bool(sol.success)
np.testing.assert_allclose(np.asarray(sol.xs[-1]), [np.pi, 0.0], atol=1e-3)
print("TUTORIAL 3 OK")
