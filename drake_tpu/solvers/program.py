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

from drake_tpu.solvers import al_newton, conic, ipm, sqp


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
        self._sym_dims: dict = {}
        self._binary_indices: List[int] = []

    # ------------------------------ variables ------------------------------

    def NewContinuousVariables(self, size: int, name: str = "x") -> Variables:
        v = Variables(self._num_vars, int(size), name)
        self._num_vars += int(size)
        self._blocks.append(v)
        return v

    def NewSymmetricContinuousVariables(
        self, m: int, name: str = "S"
    ) -> Variables:
        """An m x m symmetric matrix variable, stored as its lower triangle
        (column-major svec, diagonal included) — the reference's
        NewSymmetricContinuousVariables.  Pair with
        AddPositiveSemidefiniteConstraint."""
        v = self.NewContinuousVariables(conic.svec_size(m), name)
        self._sym_dims[(v.start, v.size)] = m
        return v

    def NewBinaryVariables(self, size: int, name: str = "b") -> Variables:
        """Binary {0,1} decision variables (the MIP tier).  Solve() runs
        branch-and-bound over the convex relaxation when any exist."""
        v = self.NewContinuousVariables(size, name)
        self._binary_indices.extend(range(v.start, v.start + v.size))
        self.AddBoundingBoxConstraint(0.0, 1.0, v)
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

    def AddLorentzConeConstraint(self, A, b, var: Variables):
        """A x + b in SOC: (Ax+b)[0] >= ||(Ax+b)[1:]|| (the reference's
        LorentzConeConstraint)."""
        A = np.atleast_2d(np.asarray(A, float))
        self._constraints.append(
            _Record("soc", var, A=A, b=np.asarray(b, float).reshape(A.shape[0]))
        )

    def AddRotatedLorentzConeConstraint(self, A, b, var: Variables):
        """A x + b = (w0, w1, u) with w0*w1 >= ||u||^2, w0, w1 >= 0.

        Mapped to the plain SOC via (w0+w1, w0-w1, 2u)."""
        A = np.atleast_2d(np.asarray(A, float))
        b = np.asarray(b, float).reshape(A.shape[0])
        m = A.shape[0]
        # (w0, w1, u) -> (w0+w1, w0-w1, 2u): w0*w1 >= ||u||^2 and w0,w1 >= 0
        # iff w0+w1 >= ||(w0-w1, 2u)||.
        T = np.zeros((m, m))
        T[0, 0] = T[0, 1] = 1.0
        T[1, 0], T[1, 1] = 1.0, -1.0
        for i in range(2, m):
            T[i, i] = 2.0
        self._constraints.append(_Record("soc", var, A=T @ A, b=T @ b))

    def AddPositiveSemidefiniteConstraint(self, var: Variables):
        """The symmetric matrix stored in `var` (from
        NewSymmetricContinuousVariables) must be PSD."""
        key = (var.start, var.size)
        if key not in self._sym_dims:
            raise ValueError(
                "AddPositiveSemidefiniteConstraint needs a block from "
                "NewSymmetricContinuousVariables"
            )
        m = self._sym_dims[key]
        self._constraints.append(
            _Record("psd", var, A=conic.svec_to_full_matrix_rows(m),
                    b=np.zeros(m * m), c=float(m))
        )

    def AddLinearMatrixInequalityConstraint(self, F: Sequence, var: Variables):
        """F[0] + sum_i x_i F[i+1] >= 0 (PSD), the reference's
        LinearMatrixInequalityConstraint."""
        F = [np.asarray(Fi, float) for Fi in F]
        m = F[0].shape[0]
        if len(F) != var.size + 1:
            raise ValueError("need one matrix per variable plus the constant")
        A = np.stack([Fi.reshape(m * m) for Fi in F[1:]], axis=1)
        self._constraints.append(
            _Record("psd", var, A=A, b=F[0].reshape(m * m), c=float(m))
        )

    def AddQuadraticConstraint(self, Q, b, lb, ub, var: Variables):
        """lb <= 0.5 x'Qx + b'x <= ub (reference AddQuadraticConstraint).

        Stored as a generic (fn-based) record so every solver path (SQP,
        AL-Newton) works unchanged, with the quadratic structure stashed
        for solvers/semidefinite_relaxation.make_semidefinite_relaxation.
        """
        Qn = np.asarray(Q, float)
        bn = np.asarray(b, float).reshape(-1)

        def fn(x, Qj=jnp.asarray(Qn), bj=jnp.asarray(bn)):
            return 0.5 * x @ (Qj.astype(x.dtype) @ x) + bj.astype(x.dtype) @ x

        self._constraints.append(
            _Record(
                "generic", var, fn=fn, Q=Qn, b=bn,
                lb=np.atleast_1d(np.asarray(lb, float)),
                ub=np.atleast_1d(np.asarray(ub, float)),
            )
        )

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
        """The GetProgramType role: 'lp' | 'qp' | 'conic' | 'nlp' (+ 'mip'
        handled orthogonally by Solve when binary variables exist)."""
        if any(r.kind == "generic" for r in self._costs) or any(
            r.kind == "generic" for r in self._constraints
        ):
            return "nlp"
        if any(r.kind in ("soc", "psd") for r in self._constraints):
            return "conic"
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
        if self._binary_indices:
            from drake_tpu.solvers import branch_and_bound

            return branch_and_bound.solve_mip(self, dtype=dtype, options=options)
        return self._solve_relaxation(dtype, options)

    def _solve_relaxation(self, dtype, options) -> MathematicalProgramResult:
        kind = self.program_type()
        if kind in ("lp", "qp"):
            return self._solve_qp(dtype, options)
        if kind == "conic":
            return self._solve_conic(dtype, options)
        return self._solve_nlp(dtype, options)

    def _solve_conic(self, dtype, options):
        """Assemble Ax + s = b over the cone product and run the ADMM conic
        solver (the SCS/Clarabel backend role)."""
        n = self._num_vars
        P, q, c0 = self._assemble_quadratic()
        zero_rows, zero_rhs = [], []
        pos_rows, pos_rhs = [], []
        soc_blocks = []  # (A_rows, b) per cone
        psd_blocks = []  # (A_rows, b, m)
        for r in self._constraints:
            if r.kind == "linear":
                A = self._expand(r, r.A)
                for i in range(A.shape[0]):
                    row, lo, hi = A[i], r.lb[i], r.ub[i]
                    if lo == hi:
                        zero_rows.append(row)
                        zero_rhs.append(lo)
                        continue
                    if np.isfinite(hi):  # hi - a'x >= 0: s = hi - a'x
                        pos_rows.append(row)
                        pos_rhs.append(hi)
                    if np.isfinite(lo):  # a'x - lo >= 0: s = -lo + a'x
                        pos_rows.append(-row)
                        pos_rhs.append(-lo)
            elif r.kind == "soc":
                # s = A_r x + b_r in SOC  ->  conic rows (-A_r, b_r).
                soc_blocks.append((-self._expand(r, r.A), r.b))
            elif r.kind == "psd":
                psd_blocks.append((-self._expand(r, r.A), r.b, int(r.c)))
        rows = []
        rhs = []
        for row, v in zip(zero_rows, zero_rhs):
            rows.append(row)
            rhs.append(v)
        for row, v in zip(pos_rows, pos_rhs):
            rows.append(row)
            rhs.append(v)
        socs = []
        for A_r, b_r in soc_blocks:
            rows.extend(A_r)
            rhs.extend(b_r)
            socs.append(A_r.shape[0])
        psds = []
        for A_r, b_r, m in psd_blocks:
            rows.extend(A_r)
            rhs.extend(b_r)
            psds.append(m)
        A = np.stack(rows) if rows else np.zeros((0, n))
        b = np.asarray(rhs, float)
        cone = conic.ConeDims(
            zero=len(zero_rows), nonneg=len(pos_rows),
            socs=tuple(socs), psds=tuple(psds),
        )
        opts = (
            options
            if isinstance(options, conic.ConicOptions)
            else conic.ConicOptions()
        )
        sol = conic.solve_conic(
            jnp.asarray(P, dtype), jnp.asarray(q, dtype), jnp.asarray(A, dtype),
            jnp.asarray(b, dtype), cone, opts,
            x0=jnp.asarray(self.initial_guess(), dtype),
        )
        z = np.asarray(sol.x)
        cost = 0.5 * z @ (P @ z) + q @ z + c0
        return MathematicalProgramResult(
            z, cost, bool(sol.converged), {"solver": "conic_admm", "conic": sol}
        )

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
            success = bool(res.success)
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
