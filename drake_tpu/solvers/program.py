"""MathematicalProgram: declarative optimization-program container.

Re-derivation of the reference's program layer (solvers/
mathematical_program.h:146 — NewContinuousVariables :241, AddCost :913,
AddConstraint families; solvers/solve.h:32 Solve();
choose_best_solver.h:19 dispatch) in the TPU shape: decision variables are
index blocks into one flat vector z, costs/constraints are typed records
(the Binding<Cost>/Binding<Constraint> role), and Solve() classifies the
program (the GetProgramType role) and dispatches:

  - linear/quadratic costs + linear constraints  -> dense Mehrotra IPM QP
    (solvers/ipm.py; general two-sided rows become slack variables), the
    OSQP/Clarabel role;
  - anything nonlinear -> Sl1QP SQP (solvers/sqp.py, the SNOPT role) or
    augmented-Lagrangian Newton (solvers/al_newton.py, the IPOPT role)
    with inequalities slacked into equalities + boxes.

No symbolic Expression tree is needed: JAX tracing IS the symbolic layer —
linear/quadratic structure is either declared via the typed Add* calls or
extracted exactly by jax.jacfwd/jax.hessian at z=0 (the role of
symbolic::DecomposeAffineExpressions).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.solvers import al_newton, ipm, sqp


class Variables(NamedTuple):
    """A named block of decision variables: indices into the flat z."""

    start: int
    size: int
    name: str

    def indices(self):
        return np.arange(self.start, self.start + self.size)

    def __len__(self):
        return self.size

    def __getitem__(self, idx) -> "Variables":
        sub = self.indices()[idx]
        sub = np.atleast_1d(sub)
        if not (np.diff(sub) == 1).all():
            raise ValueError("variable slices must be contiguous")
        return Variables(int(sub[0]), len(sub), f"{self.name}[{idx}]")


@dataclasses.dataclass
class _Record:
    kind: str  # cost: linear|quadratic|generic ; constraint: linear|generic
    vars: Variables
    fn: Optional[Callable] = None
    A: Optional[np.ndarray] = None  # linear rows
    Q: Optional[np.ndarray] = None
    b: Optional[np.ndarray] = None
    c: float = 0.0
    lb: Optional[np.ndarray] = None
    ub: Optional[np.ndarray] = None


class MathematicalProgramResult:
    def __init__(self, z, cost, success, info):
        self._z = z
        self.optimal_cost = float(cost)
        self._success = bool(success)
        self.solver_info = info

    def is_success(self) -> bool:
        return self._success

    def GetSolution(self, var: Variables):
        out = self._z[var.start : var.start + var.size]
        return out[0] if var.size == 1 else out


class MathematicalProgram:
    def __init__(self):
        self._num_vars = 0
        self._blocks: List[Variables] = []
        self._costs: List[_Record] = []
        self._constraints: List[_Record] = []
        self._guess: dict = {}

    # ------------------------------ variables ------------------------------

    def NewContinuousVariables(self, size: int, name: str = "x") -> Variables:
        v = Variables(self._num_vars, int(size), name)
        self._num_vars += int(size)
        self._blocks.append(v)
        return v

    @property
    def num_vars(self) -> int:
        return self._num_vars

    def SetInitialGuess(self, var: Variables, value) -> None:
        self._guess[(var.start, var.size)] = np.asarray(value, float).reshape(
            var.size
        )

    # ------------------------------- costs ---------------------------------

    def AddLinearCost(self, a, var: Variables, b: float = 0.0):
        self._costs.append(
            _Record("linear", var, A=np.asarray(a, float).reshape(1, -1),
                    c=float(b))
        )

    def AddQuadraticCost(self, Q, b, var: Variables, c: float = 0.0):
        """0.5 x'Qx + b'x + c over the block."""
        self._costs.append(
            _Record("quadratic", var, Q=np.asarray(Q, float),
                    b=np.asarray(b, float), c=float(c))
        )

    def AddQuadraticErrorCost(self, Q, x_desired, var: Variables):
        Q = np.asarray(Q, float)
        xd = np.asarray(x_desired, float)
        self.AddQuadraticCost(2.0 * Q, -2.0 * Q @ xd, var, c=float(xd @ Q @ xd))

    def AddCost(self, fn: Callable, var: Variables):
        """Generic cost fn(x_block) -> scalar (jax-traceable)."""
        self._costs.append(_Record("generic", var, fn=fn))

    # ----------------------------- constraints -----------------------------

    def AddLinearEqualityConstraint(self, A, b, var: Variables):
        A = np.atleast_2d(np.asarray(A, float))
        b = np.atleast_1d(np.asarray(b, float))
        self._constraints.append(
            _Record("linear", var, A=A, lb=b, ub=b)
        )

    def AddLinearConstraint(self, A, lb, ub, var: Variables):
        A = np.atleast_2d(np.asarray(A, float))
        self._constraints.append(
            _Record(
                "linear", var, A=A,
                lb=np.broadcast_to(np.asarray(lb, float), (A.shape[0],)),
                ub=np.broadcast_to(np.asarray(ub, float), (A.shape[0],)),
            )
        )

    def AddBoundingBoxConstraint(self, lb, ub, var: Variables):
        eye = np.eye(var.size)
        self.AddLinearConstraint(eye, lb, ub, var)

    def AddConstraint(self, fn: Callable, lb, ub, var: Variables):
        """Generic constraint lb <= fn(x_block) <= ub (jax-traceable)."""
        out_shape = jax.eval_shape(
            fn, jax.ShapeDtypeStruct((var.size,), jnp.float64)
        ).shape
        m = int(np.prod(out_shape)) if out_shape else 1
        self._constraints.append(
            _Record(
                "generic", var, fn=fn,
                lb=np.broadcast_to(np.asarray(lb, float), (m,)).copy(),
                ub=np.broadcast_to(np.asarray(ub, float), (m,)).copy(),
            )
        )

    # ------------------------------- solve ---------------------------------

    def program_type(self) -> str:
        """The GetProgramType role: 'qp' | 'lp' | 'nlp'."""
        if any(r.kind == "generic" for r in self._costs) or any(
            r.kind == "generic" for r in self._constraints
        ):
            return "nlp"
        if any(r.kind == "quadratic" for r in self._costs):
            return "qp"
        return "lp"

    def initial_guess(self) -> np.ndarray:
        z0 = np.zeros(self._num_vars)
        for (start, size), val in self._guess.items():
            z0[start : start + size] = val
        return z0

    def _expand(self, rec: _Record, M: np.ndarray) -> np.ndarray:
        """Scatter a (m, block) matrix into (m, num_vars)."""
        out = np.zeros((M.shape[0], self._num_vars))
        out[:, rec.vars.start : rec.vars.start + rec.vars.size] = M
        return out

    def Solve(self, dtype=jnp.float64, options=None) -> MathematicalProgramResult:
        kind = self.program_type()
        if kind in ("lp", "qp"):
            return self._solve_qp(dtype, options)
        return self._solve_nlp(dtype, options)

    def _assemble_quadratic(self):
        n = self._num_vars
        P = np.zeros((n, n))
        q = np.zeros(n)
        c0 = 0.0
        for r in self._costs:
            s = r.vars.start
            e = s + r.vars.size
            if r.kind == "quadratic":
                P[s:e, s:e] += r.Q
                q[s:e] += r.b
                c0 += r.c
            elif r.kind == "linear":
                q[s:e] += r.A[0]
                c0 += r.c
        return P, q, c0

    def _solve_qp(self, dtype, options):
        n = self._num_vars
        P, q, c0 = self._assemble_quadratic()
        # Split linear rows: equalities stay; two-sided rows get slacks
        # (rows that are pure variable bounds fold into the box).
        box_lb = np.full(n, -np.inf)
        box_ub = np.full(n, np.inf)
        eq_rows, eq_rhs = [], []
        sl_rows, sl_lb, sl_ub = [], [], []
        for r in self._constraints:
            A = self._expand(r, r.A)
            for i in range(A.shape[0]):
                row, lo, hi = A[i], r.lb[i], r.ub[i]
                nz = np.nonzero(row)[0]
                if lo == hi:
                    eq_rows.append(row)
                    eq_rhs.append(lo)
                elif len(nz) == 1 and row[nz[0]] != 0.0:
                    s = row[nz[0]]
                    l2, h2 = sorted((lo / s, hi / s))
                    box_lb[nz[0]] = max(box_lb[nz[0]], l2)
                    box_ub[nz[0]] = min(box_ub[nz[0]], h2)
                else:
                    sl_rows.append(row)
                    sl_lb.append(lo)
                    sl_ub.append(hi)
        ns = len(sl_rows)
        ntot = n + ns
        Pt = np.zeros((ntot, ntot))
        Pt[:n, :n] = P
        qt = np.concatenate([q, np.zeros(ns)])
        G_rows = []
        b_rhs = []
        for row, rhs in zip(eq_rows, eq_rhs):
            G_rows.append(np.concatenate([row, np.zeros(ns)]))
            b_rhs.append(rhs)
        for k, row in enumerate(sl_rows):
            s_row = np.zeros(ns)
            s_row[k] = -1.0
            G_rows.append(np.concatenate([row, s_row]))
            b_rhs.append(0.0)
        G = (
            np.stack(G_rows) if G_rows else np.zeros((0, ntot))
        )
        b = np.asarray(b_rhs)
        lb = np.concatenate([box_lb, np.asarray(sl_lb, float)])
        ub = np.concatenate([box_ub, np.asarray(sl_ub, float)])
        # Symmetrize (AddQuadraticCost convention is 0.5 x'Qx with Q sym).
        Pt = 0.5 * (Pt + Pt.T)
        # Ignore NLP solver options when the program dispatches to the QP
        # backend (mirrors SolverOptions being per-solver in the reference).
        opts = (
            options if isinstance(options, ipm.IpmOptions) else ipm.IpmOptions()
        )
        sol = ipm.solve_qp_ipm(
            jnp.asarray(Pt, dtype), jnp.asarray(qt, dtype),
            jnp.asarray(G, dtype), jnp.asarray(b, dtype),
            jnp.asarray(lb, dtype), jnp.asarray(ub, dtype), opts,
        )
        z = np.asarray(sol.w)[: n]
        cost = 0.5 * z @ (P @ z) + q @ z + c0
        return MathematicalProgramResult(
            z, cost, bool(sol.converged), {"solver": "ipm", "qp": sol}
        )

    def _solve_nlp(self, dtype, options):
        n = self._num_vars
        # Inequalities become equalities with slack variables; slacks carry
        # the bounds (the standard Sl1QP/AL transformation).
        slacked = []  # (record, slack_start, m)
        ns = 0
        box_lb = np.full(n, -np.inf)
        box_ub = np.full(n, np.inf)
        eq_linear = []  # expanded rows with rhs
        for r in self._constraints:
            if r.kind == "linear":
                A = self._expand(r, r.A)
                for i in range(A.shape[0]):
                    row, lo, hi = A[i], r.lb[i], r.ub[i]
                    nz = np.nonzero(row)[0]
                    if lo == hi:
                        eq_linear.append((row, lo))
                    elif len(nz) == 1:
                        s = row[nz[0]]
                        l2, h2 = sorted((lo / s, hi / s))
                        box_lb[nz[0]] = max(box_lb[nz[0]], l2)
                        box_ub[nz[0]] = min(box_ub[nz[0]], h2)
                    else:
                        slacked.append((("row", row), ns, 1, lo, hi))
                        ns += 1
            else:
                # Slack every generic row (equality rows pin the slack via
                # its box, lb == ub).
                m = len(r.lb)
                slacked.append((("fn", r), ns, m, r.lb, r.ub))
                ns += m
        ntot = n + ns
        z0 = np.concatenate([self.initial_guess(), np.zeros(ns)])
        lb = np.concatenate([box_lb, np.zeros(ns)])
        ub = np.concatenate([box_ub, np.zeros(ns)])
        # Fill slack bounds.
        for spec, s0, m, lo, hi in slacked:
            lb[n + s0 : n + s0 + m] = lo
            ub[n + s0 : n + s0 + m] = hi

        costs = list(self._costs)

        def cost_fn(z):
            total = jnp.asarray(0.0, z.dtype)
            for r in costs:
                xb = z[r.vars.start : r.vars.start + r.vars.size]
                if r.kind == "generic":
                    total = total + r.fn(xb)
                elif r.kind == "quadratic":
                    Q = jnp.asarray(r.Q, z.dtype)
                    bq = jnp.asarray(r.b, z.dtype)
                    total = total + 0.5 * xb @ (Q @ xb) + bq @ xb + r.c
                else:
                    total = total + jnp.asarray(r.A[0], z.dtype) @ xb + r.c
            return total

        def constraint_fn(z):
            rows = []
            for row, rhs in eq_linear:
                rows.append(jnp.asarray(row, z.dtype) @ z[: n] - rhs)
            for spec, s0, m, lo, hi in slacked:
                s_val = z[n + s0 : n + s0 + m]
                if spec[0] == "row":
                    rows.append(jnp.asarray(spec[1], z.dtype) @ z[: n] - s_val[0])
                else:
                    r = spec[1]
                    xb = z[r.vars.start : r.vars.start + r.vars.size]
                    g = jnp.atleast_1d(r.fn(xb))
                    for i in range(m):
                        rows.append(g[i] - s_val[i])
            if not rows:
                return jnp.zeros(0, z.dtype)
            return jnp.stack(rows)

        opts = options or sqp.SqpOptions()
        if isinstance(opts, al_newton.AlNewtonOptions):
            res = al_newton.solve(
                lambda z: cost_fn(z), lambda z: constraint_fn(z),
                jnp.asarray(z0, dtype), jnp.asarray(lb, dtype),
                jnp.asarray(ub, dtype), options=opts,
            )
            success = bool(res.converged)
            zsol = np.asarray(res.z)
        else:
            res = sqp.solve(
                lambda z: cost_fn(z), lambda z: constraint_fn(z),
                jnp.asarray(z0, dtype), jnp.asarray(lb, dtype),
                jnp.asarray(ub, dtype), options=opts,
            )
            success = bool(res.success)
            zsol = np.asarray(res.z)
        cost = float(cost_fn(jnp.asarray(zsol)))
        return MathematicalProgramResult(
            zsol[: n], cost, success, {"solver": "sqp/al", "result": res}
        )


def Solve(prog: MathematicalProgram, **kw) -> MathematicalProgramResult:
    """Free-function entry mirroring drake::solvers::Solve (solve.h:32)."""
    return prog.Solve(**kw)
