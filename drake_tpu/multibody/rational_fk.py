"""Rational forward kinematics (multibody/rational/rational_forward_kinematics.h).

Parameterize each revolute joint angle as q = q* + Delta with
s = tan(Delta / 2).  Rodrigues' formula with the half-angle substitution
sin(Delta) = 2s/(1+s^2), cos(Delta) = (1-s^2)/(1+s^2) makes every link pose a
RATIONAL function of the s variables — the algebraic form that powers C-IRIS
certification (reference geometry/optimization/cspace_free_polytope.h): a
collision-free condition becomes a polynomial nonnegativity condition in s.

Poses are stored the way the reference's RationalFunction does: POLYNOMIAL
numerator matrices (NumPy object arrays of drake_tpu.math.symbolic
Expressions) over the explicit common denominator prod_i (1 + s_i^2) of the
revolute joints on the path to the body — no symbolic cancellation needed.
Supported joints: revolute (rational in s), prismatic (affine), weld
(constant); the reference likewise restricts to revolute/weld/prismatic
chains.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import numpy as np

from drake_tpu.math import symbolic as sym
from drake_tpu.multibody.model import (
    PRISMATIC, REVOLUTE, WELD, MultibodyModel, MultibodyParams,
)


class RationalPose(NamedTuple):
    """Pose as (R_num / denom, p_num / denom); numerators are polynomial."""

    R_num: np.ndarray  # (3,3) object array of Expression (polynomial in s)
    p_num: np.ndarray  # (3,) object array of Expression (polynomial in s)
    denom: sym.Expression  # prod (1 + s_i^2) over revolute joints on path


def _skew(a: np.ndarray) -> np.ndarray:
    return np.array([
        [0.0, -a[2], a[1]],
        [a[2], 0.0, -a[0]],
        [-a[1], a[0], 0.0],
    ])


def _to_obj(mat) -> np.ndarray:
    out = np.empty(np.shape(mat), dtype=object)
    flat_in = np.asarray(mat, dtype=object).ravel()
    flat = out.ravel()
    for i, v in enumerate(flat_in):
        flat[i] = sym.to_expression(
            v if isinstance(v, (sym.Expression, sym.Variable)) else float(v))
    return out


def _rodrigues_numeric(a: np.ndarray, theta: float) -> np.ndarray:
    K = _skew(a)
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class RationalForwardKinematics:
    """Link poses as rational expressions in s = tan((q - q*)/2)."""

    def __init__(self, model: MultibodyModel, params: MultibodyParams,
                 q_star: Sequence[float]):
        self.model = model
        self.q_star = np.asarray(q_star, dtype=np.float64)
        self.s: List[sym.Variable] = []  # one per revolute/prismatic joint
        self._s_joint: List[int] = []  # joint index per s variable

        X_PJ_R = np.asarray(params.X_PJ_R, dtype=np.float64)
        X_PJ_p = np.asarray(params.X_PJ_p, dtype=np.float64)
        axes = np.asarray(params.axis, dtype=np.float64)
        one = sym.to_expression(1.0)

        poses: List[RationalPose] = []
        for i in range(model.num_bodies):
            jt = model.joint_types[i]
            qo = model.q_offsets[i]
            R_PJ = X_PJ_R[i]
            p_PJ = _to_obj(X_PJ_p[i])
            a = axes[i]
            d_i = one  # this joint's denominator factor
            if jt == REVOLUTE:
                si = sym.Variable(f"s[{len(self.s)}]")
                self.s.append(si)
                self._s_joint.append(i)
                qs = float(self.q_star[qo])
                d_i = 1.0 + si * si
                # R_J(q* + Delta) = R_axis(q*) R_axis(Delta) (same-axis
                # rotations commute); numerator of R_axis(Delta) over d_i:
                #   (1+s^2) I + 2 s K + 2 s^2 K^2.
                K = _skew(a)
                NR_delta = _to_obj(np.eye(3))
                K_obj = _to_obj(K)
                K2_obj = _to_obj(K @ K)
                for r in range(3):
                    for c in range(3):
                        NR_delta[r, c] = (d_i * NR_delta[r, c]
                                          + (2.0 * si) * K_obj[r, c]
                                          + (2.0 * si * si) * K2_obj[r, c])
                NR = _to_obj(R_PJ @ _rodrigues_numeric(a, qs)) @ NR_delta
                # p numerator over d_i: p_PJ is constant.
                Np = np.array([d_i * e for e in p_PJ], dtype=object)
            elif jt == PRISMATIC:
                si = sym.Variable(f"s[{len(self.s)}]")
                self.s.append(si)
                self._s_joint.append(i)
                qs = float(self.q_star[qo])
                NR = _to_obj(R_PJ)
                d = R_PJ @ a
                Np = np.array(
                    [p_PJ[r] + (qs + si) * float(d[r]) for r in range(3)],
                    dtype=object)
            elif jt == WELD:
                NR = _to_obj(R_PJ)
                Np = p_PJ
            else:
                raise ValueError(
                    f"rational FK supports revolute/prismatic/weld joints; "
                    f"joint {i} is {jt!r}")

            parent = model.parent[i]
            if parent < 0:
                poses.append(RationalPose(NR, Np, d_i))
            else:
                Rp, pp, dp = poses[parent]
                # X_WB = X_WP * X_PB with denominators dp and d_i:
                #   R_WB = (Rp @ NR) / (dp d_i)
                #   p_WB = p_WP + R_WP p_PB = (d_i pp + Rp @ Np) / (dp d_i)
                NR_w = Rp @ NR
                Np_w = np.array(
                    [d_i * pp[r] + (Rp[r] @ Np) for r in range(3)],
                    dtype=object)
                poses.append(RationalPose(NR_w, Np_w, dp * d_i))
        self.poses = poses

    def compute_s(self, q: Sequence[float]) -> np.ndarray:
        """Numeric s values for configuration q (revolute: tan(dq/2),
        prismatic: q - q*)."""
        q = np.asarray(q, dtype=np.float64)
        out = np.zeros(len(self.s))
        for k, i in enumerate(self._s_joint):
            qo = self.model.q_offsets[i]
            if self.model.joint_types[i] == REVOLUTE:
                out[k] = np.tan(0.5 * (q[qo] - self.q_star[qo]))
            else:
                out[k] = q[qo] - self.q_star[qo]
        return out

    def pose_expressions(self, body: int) -> RationalPose:
        return self.poses[body]

    def evaluate_pose(self, body: int, q: Sequence[float]):
        """Numeric (R, p) of `body` by evaluating the rational expressions."""
        s_val = self.compute_s(q)
        env = dict(zip(self.s, s_val))
        NR, Np, denom = self.poses[body]
        d = sym.to_expression(denom).Evaluate(env)
        R = np.array([[sym.to_expression(NR[r, c]).Evaluate(env) / d
                       for c in range(3)] for r in range(3)])
        p = np.array([sym.to_expression(Np[r]).Evaluate(env) / d
                      for r in range(3)])
        return R, p
