"""C-space free polytope certification — the C-IRIS role.

Reference geometry/optimization/cspace_free_polytope.h: certify that a
polytope {s : C s <= d} in the tangent-configuration space s = tan(dq/2)
(rational forward kinematics, multibody/rational/) is collision-free, by
turning each collision pair into a polynomial nonnegativity condition in s
and certifying it with a positivstellensatz.

Design difference from the reference (documented, deliberate): the
reference certifies with SOS/Lagrangian multipliers solved as SDPs (Mosek).
Here positivity of g(s) on the bounded polytope is certified with the
HANDELMAN representation

    g(s) = sum_alpha  lam_alpha  prod_i (d_i - C_i s)^{alpha_i},
    lam_alpha >= 0,

which is exact for polynomials positive on a simplex-bounded polytope at
high enough product degree (Handelman's positivstellensatz) and reduces to
a nonnegative least-squares / LP feasibility problem — no SDP backend
needed, and the certificate is checkable by direct expansion.  Like the
reference's fixed-degree SOS, a fixed product degree makes the test
SUFFICIENT (certified => collision-free); failure to certify is
inconclusive.

Collision pairs: sphere-sphere AND capsule pairs (sphere-capsule,
capsule-capsule).  The reference builds separating-plane polynomial
conditions per geometry pair (cspace_free_polytope.h); here capsules are
handled by introducing the segment parameters as AUXILIARY box-bounded
indeterminates: with t, u in [0, 1] the points of the two segments,

    g(s, t, u) = ||p_A(s, t) - p_B(s, u)||^2 - (r_a + r_b)^2  >= 0
                 on {C s <= d} x [0, 1]^2

is a polynomial nonnegativity condition on a polytope (the box faces of
t, u join C s <= d as Handelman faces), so the SAME certificate machinery
applies — min-free, clamp-free, and exact for spheres as the degenerate
zero-length capsule.
"""

from __future__ import annotations

import itertools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from drake_tpu.math import symbolic as sym
from drake_tpu.multibody.rational_fk import RationalForwardKinematics


class CertificationResult(NamedTuple):
    certified: bool
    residual: float  # coefficient-match residual of the best certificate
    degree: int  # Handelman product degree used


def _monomial_basis(variables, degree: int):
    """All monomials in `variables` up to total degree `degree`."""
    basis = []
    n = len(variables)
    for total in range(degree + 1):
        for powers in itertools.combinations_with_replacement(
            range(n), total
        ):
            d = {}
            for idx in powers:
                d[variables[idx]] = d.get(variables[idx], 0) + 1
            basis.append(sym.Monomial(d))
    return basis


def _poly_vector(p: sym.Polynomial, basis) -> np.ndarray:
    index = {m: i for i, m in enumerate(basis)}
    v = np.zeros(len(basis))
    for m, c in p.monomial_to_coefficient_map().items():
        if m not in index:
            raise ValueError(
                f"monomial {m!r} of degree {m.degree()} outside the basis"
            )
        v[index[m]] += c
    return v


def _nnls(
    A: np.ndarray,
    b: np.ndarray,
    iters: int = 2000,
    target: Optional[float] = None,
    max_iters: int = 60000,
) -> np.ndarray:
    """min ||A x - b||, x >= 0 via projected accelerated gradient.

    Small host-side problems (hundreds of columns); the Lipschitz step is
    1/||A||^2.  Runs in chunks of ``iters``: stops early once the residual
    reaches ``target`` (when given), keeps going up to ``max_iters`` while
    the residual still improves — capsule-pair certificates (higher-degree
    programs) need ~10x the iterations the sphere-pair ones do.
    """
    AtA = A.T @ A
    Atb = A.T @ b
    L = np.linalg.norm(AtA, 2) + 1e-12
    x = np.maximum(np.linalg.lstsq(A, b, rcond=None)[0], 0.0)
    y, t = x.copy(), 1.0
    done = 0
    res_prev = np.inf
    while done < max_iters:
        for _ in range(iters):
            grad = AtA @ y - Atb
            x_new = np.maximum(y - grad / L, 0.0)
            t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
            y = x_new + ((t - 1.0) / t_new) * (x_new - x)
            x, t = x_new, t_new
        done += iters
        res = float(np.linalg.norm(A @ x - b))
        if target is not None and res < target:
            break
        if res > 0.9 * res_prev and done >= 2 * iters:
            break  # plateau: < 10% gain over a whole chunk
        res_prev = res
    return x


def certify_positive_on_polytope(
    g: sym.Polynomial,
    C: np.ndarray,
    d: np.ndarray,
    s_vars: Sequence[sym.Variable],
    degree: Optional[int] = None,
    tol: float = 1e-7,
) -> CertificationResult:
    """Handelman certificate that g(s) >= 0 on {C s <= d}.

    degree: max number of polytope-face factors per product (default: the
    total degree of g — the minimum that can match g's top monomials).
    """
    C = np.asarray(C, float)
    d = np.asarray(d, float)
    nf = C.shape[0]
    deg = int(degree if degree is not None else max(g.TotalDegree(), 1))

    faces = [
        sym.Polynomial(
            float(d[i])
            - sum(float(C[i, j]) * sym.to_expression(s_vars[j])
                  for j in range(len(s_vars))),
            indeterminates=s_vars,
        )
        for i in range(nf)
    ]

    # products of up to `deg` faces (with repetition), including the empty
    # product (the constant certificate term)
    products: List[sym.Polynomial] = []
    one = sym.Polynomial(1.0, indeterminates=s_vars)
    for count in range(deg + 1):
        for combo in itertools.combinations_with_replacement(
            range(nf), count
        ):
            p = one
            for i in combo:
                p = p * faces[i]
            products.append(p)

    # DSOS augmentation (Ahmadi-Majumdar diagonally-dominant SOS, the
    # LP-tractable inner approximation of the reference's SOS multipliers):
    # squares of monomials and of pairwise monomial sums/differences are
    # globally nonnegative, so they are sound certificate atoms.  Pure
    # Handelman converges slowly for polynomials whose minimum sits in the
    # polytope interior (e.g. s1^2 - s1 s2 + s2^2); the square atoms close
    # exactly that gap while keeping the program an LP/NNLS.
    half = [m for m in _monomial_basis(list(s_vars), deg // 2)
            if m.degree() >= 1]
    for m in half:
        pm = sym.Polynomial(m.ToExpression(), indeterminates=s_vars)
        products.append(pm * pm)
    for (ma, mb) in itertools.combinations(half, 2):
        pa = sym.Polynomial(ma.ToExpression(), indeterminates=s_vars)
        pb = sym.Polynomial(mb.ToExpression(), indeterminates=s_vars)
        diff = pa + (pb * (-1.0))
        tot = pa + pb
        products.append(diff * diff)
        products.append(tot * tot)

    basis = _monomial_basis(list(s_vars), deg)
    A = np.stack([_poly_vector(p, basis) for p in products], axis=1)
    b = _poly_vector(g, basis)

    scale = max(np.abs(b).max(), 1.0)
    lam = _nnls(A / scale, b / scale, target=0.1 * tol)
    residual = float(np.linalg.norm(A @ lam - b) / scale)
    return CertificationResult(
        certified=residual < tol, residual=residual, degree=deg
    )


class SpherePair(NamedTuple):
    body_a: int
    p_Aa: np.ndarray  # sphere center in body-A frame
    radius_a: float
    body_b: int
    p_Bb: np.ndarray
    radius_b: float


def pair_distance_polynomial(
    rfk: RationalForwardKinematics, pair: SpherePair
) -> sym.Polynomial:
    """g(s) = ||p_A(s) - p_B(s)||^2 D^2 - (ra+rb)^2 D^2 as a POLYNOMIAL.

    Multiplying through by the (positive) common denominator D(s) =
    D_A D_B keeps everything polynomial: with world centers p = N/D_A and
    q = M/D_B,  ||p - q||^2 - r^2  >=  0  <=>
    ||N D_B - M D_A||^2 - r^2 (D_A D_B)^2 >= 0.
    """
    NA, pA, dA = rfk.pose_expressions(pair.body_a)
    NB, pB, dB = rfk.pose_expressions(pair.body_b)
    r = float(pair.radius_a + pair.radius_b)

    def center_num(NR, Np, p_local):
        return np.array(
            [
                sum(NR[k, j] * float(p_local[j]) for j in range(3)) + Np[k]
                for k in range(3)
            ],
            dtype=object,
        )

    nA = center_num(NA, pA, pair.p_Aa)
    nB = center_num(NB, pB, pair.p_Bb)
    dA_e = sym.to_expression(dA)
    dB_e = sym.to_expression(dB)
    diff = [nA[k] * dB_e - nB[k] * dA_e for k in range(3)]
    g_expr = sum(diff[k] * diff[k] for k in range(3)) - (
        (r * r) * (dA_e * dB_e) * (dA_e * dB_e)
    )
    return sym.Polynomial(g_expr, indeterminates=rfk.s)


class CapsulePair(NamedTuple):
    """A capsule-capsule (or sphere-capsule with a zero-length segment)
    collision pair: segment endpoints in each body's frame + radii."""

    body_a: int
    p_Aa0: np.ndarray
    p_Aa1: np.ndarray
    radius_a: float
    body_b: int
    p_Bb0: np.ndarray
    p_Bb1: np.ndarray
    radius_b: float


def capsule_pair_distance_polynomial(
    rfk: RationalForwardKinematics, pair: CapsulePair
) -> Tuple[sym.Polynomial, list]:
    """(g(s, t, u), [t, u]): denominator-cleared squared segment-segment
    distance minus (ra+rb)^2, polynomial over s and the segment parameters
    t, u in [0, 1]."""
    NA, pA, dA = rfk.pose_expressions(pair.body_a)
    NB, pB, dB = rfk.pose_expressions(pair.body_b)
    r = float(pair.radius_a + pair.radius_b)
    t = sym.Variable("t_seg")
    u = sym.Variable("u_seg")
    t_e = sym.to_expression(t)
    u_e = sym.to_expression(u)

    def endpoint_num(NR, Np, p_local):
        return [
            sum(NR[k, j] * float(p_local[j]) for j in range(3)) + Np[k]
            for k in range(3)
        ]

    a0 = endpoint_num(NA, pA, pair.p_Aa0)
    a1 = endpoint_num(NA, pA, pair.p_Aa1)
    b0 = endpoint_num(NB, pB, pair.p_Bb0)
    b1 = endpoint_num(NB, pB, pair.p_Bb1)
    dA_e = sym.to_expression(dA)
    dB_e = sym.to_expression(dB)
    diff = [
        (a0[k] * (1.0 - t_e) + a1[k] * t_e) * dB_e
        - (b0[k] * (1.0 - u_e) + b1[k] * u_e) * dA_e
        for k in range(3)
    ]
    g_expr = sum(diff[k] * diff[k] for k in range(3)) - (
        (r * r) * (dA_e * dB_e) * (dA_e * dB_e)
    )
    return (
        sym.Polynomial(g_expr, indeterminates=list(rfk.s) + [t, u]),
        [t, u],
    )


def certify_cspace_polytope(
    rfk: RationalForwardKinematics,
    pairs: Sequence,
    C: np.ndarray,
    d: np.ndarray,
    degree: Optional[int] = None,
    tol: float = 1e-7,
) -> Tuple[bool, List[CertificationResult]]:
    """Certify every collision pair on {C s <= d} (CspaceFreePolytope::
    IsGeometrySeparable role, one Handelman program per pair).

    ``pairs`` may mix SpherePair and CapsulePair; capsule pairs certify
    over the augmented polytope {C s <= d} x [0,1]^2 (segment-parameter
    box faces appended)."""
    C = np.asarray(C, float)
    d = np.asarray(d, float)
    results = []
    for pair in pairs:
        if isinstance(pair, CapsulePair):
            g, aux = capsule_pair_distance_polynomial(rfk, pair)
            na = len(aux)
            ns = C.shape[1]
            C_aug = np.block([
                [C, np.zeros((C.shape[0], na))],
                [np.zeros((na, ns)), -np.eye(na)],
                [np.zeros((na, ns)), np.eye(na)],
            ])
            d_aug = np.concatenate([d, np.zeros(na), np.ones(na)])
            results.append(
                certify_positive_on_polytope(
                    g, C_aug, d_aug, list(rfk.s) + aux,
                    degree=degree, tol=tol,
                )
            )
        else:
            g = pair_distance_polynomial(rfk, pair)
            results.append(
                certify_positive_on_polytope(
                    g, C, d, rfk.s, degree=degree, tol=tol
                )
            )
    return all(r.certified for r in results), results
