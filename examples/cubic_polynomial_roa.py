"""Region of attraction of the cubic polynomial system, certified by LP.

Reference parity: examples/cubic_polynomial/region_of_attraction.cc — for
xdot = -x + x^3 and Lyapunov candidate V = x^2, find the largest rho with
Vdot < 0 on {0 < V <= rho}; the answer is rho = 1 (the RoA is |x| < 1).
The reference extracts the polynomial dynamics by evaluating the system on
the symbolic::Expression scalar and certifies the level set with an SOS
program (Mosek/Clarabel).

TPU-native mapping: the same dynamics evaluated on drake_tpu's Expression
scalar (drake_tpu/math/symbolic.py — tracing covers jit/grad; the symbolic
layer covers introspection like this), and the SOS certificate replaced by
the LP-tractable Handelman/DSOS certificate from the C-space free machinery
(drake_tpu/planning/cspace_free.py certify_positive_on_polytope, the
Ahmadi-Majumdar DSOS inner approximation) + bisection on rho:

    certify  -Vdot - eps*x^2 >= 0  on the box {x^2 <= rho}  (i.e. |x|<=r)

which is exactly the S-procedure the reference's line search performs.
A simulation sweep cross-checks the certified boundary empirically.

Run: python examples/cubic_polynomial_roa.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from drake_tpu.math import symbolic as sym
from drake_tpu.planning.cspace_free import certify_positive_on_polytope


def main():
    # Dynamics on the symbolic scalar (the reference's
    # CubicPolynomialSystem<Expression> evaluation).
    x = sym.Variable("x")
    xdot = -sym.to_expression(x) + sym.to_expression(x) ** 3

    # V = x^2; Vdot = dV/dx * xdot.
    V = sym.to_expression(x) ** 2
    Vdot = V.Jacobian([x])[0] * xdot
    print(f"V    = {V.Expand()}")
    print(f"Vdot = {Vdot.Expand()}")

    # Certify -Vdot - eps x^2 >= 0 on |x| <= r, bisecting on r.  The
    # certificate target vanishes at the equilibrium (an interior zero), so
    # no strictly-positive Handelman combination exists for it directly —
    # the standard move (reference region_of_attraction.cc does the same
    # through its SOS multiplier structure) is to factor the known x^2:
    #   -Vdot - eps x^2 = x^2 * h(x),  h(x) = (2 - eps) - 2 x^2,
    # and certify the strictly-positive factor h on the interval.
    eps = 1e-3
    h_expr = (2.0 - eps) - 2.0 * sym.to_expression(x) ** 2

    def certified(r: float) -> bool:
        h = sym.Polynomial(h_expr, indeterminates=[x])
        res = certify_positive_on_polytope(
            h, C=np.array([[1.0], [-1.0]]), d=np.array([r, r]),
            s_vars=[x], degree=2, tol=1e-6)
        return res.certified

    lo, hi = 0.1, 2.0
    assert certified(lo) and not certified(hi)
    for _ in range(30):
        mid = 0.5 * (lo + hi)
        lo, hi = (mid, hi) if certified(mid) else (lo, mid)
    rho = lo**2
    print(f"certified region of attraction: V(x) = x^2 < rho = {rho:.4f} "
          f"(analytic rho = 1)")

    # Empirical cross-check: simulate just inside / outside the boundary.
    def converges(x0: float, steps=4000, h=1e-2) -> bool:
        xv = x0
        for _ in range(steps):
            xv = xv + h * (-xv + xv**3)
            if abs(xv) > 10.0:
                return False
        return abs(xv) < 1e-3

    inside = converges(np.sqrt(rho) - 1e-3)
    outside = converges(1.001)
    print(f"simulation: x0 just inside certified set converges = {inside}; "
          f"x0 = 1.001 diverges = {not outside}")

    ok = abs(rho - 1.0) < 5e-3 and inside and not outside
    print("CUBIC POLYNOMIAL ROA", "SUCCESS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
