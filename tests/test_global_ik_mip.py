"""MIP global IK via branch-and-bound (VERDICT round-4 item 10).

Reference: multibody/inverse_kinematics/global_inverse_kinematics.h — the
MIP rotation relaxation escapes basins local NLP IK cannot.  The test
constructs exactly that situation: a 2-link planar arm whose target has
two IK branches (elbow-left / elbow-right); an obstacle disk blocks the
branch the local Gauss-Newton solver (canonical zero start) converges to,
and the B&B global solver returns the OTHER branch — start-free, with
clearance and exact reach."""

import numpy as np
import jax.numpy as jnp

from drake_tpu.multibody.global_ik import planar_global_ik_mip
from drake_tpu.multibody import ik
from drake_tpu.multibody.model import REVOLUTE, ModelBuilder

F64 = jnp.float64
TARGET = np.array([1.2, -0.8])


def _arm():
    b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body(
        "link1", parent=None, joint_type=REVOLUTE, mass=1.0,
        com=(0, 0, -0.5), inertia_com=np.diag([0.1, 0.1, 0.01]),
        axis=(0, 1, 0), joint_name="shoulder",
    )
    b.add_body(
        "link2", parent="link1", joint_type=REVOLUTE, mass=1.0,
        com=(0, 0, -0.5), inertia_com=np.diag([0.1, 0.1, 0.01]),
        X_PJ_xyz=(0, 0, -1.0), axis=(0, 1, 0), joint_name="elbow",
    )
    return b.build(F64)


def _elbow_xz(q):
    return np.array([-np.sin(q[0]), -np.cos(q[0])])


def _ee_xz(q):
    a = np.cumsum(q)
    return np.array(
        [-np.sin(a[0]) - np.sin(a[1]), -np.cos(a[0]) - np.cos(a[1])]
    )


class TestMipGlobalIk:
    def test_reaches_target_without_obstacle(self):
        q, info = planar_global_ik_mip([1.0, 1.0], TARGET)
        assert info["mip_success"]
        assert info["ee_error"] < 1e-8
        np.testing.assert_allclose(_ee_xz(q), TARGET, atol=1e-8)

    def test_escapes_the_basin_local_ik_lands_in(self):
        """The VERDICT 'Done' bar: global IK beats the local solver."""
        model, params = _arm()
        # Local NLP IK from the canonical zero start (knows nothing of
        # obstacles — the reference's InverseKinematics would add a
        # distance constraint and still be basin-trapped).
        t3 = jnp.asarray([TARGET[0], 0.0, TARGET[1]], F64)
        res = ik.solve_ik(
            model, params, jnp.zeros(2, F64),
            body_index=model.body_index("link2"), p_target=t3,
            p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
        )
        q_loc = np.asarray(res.z)  # SqpResult.z is the solution q
        assert np.linalg.norm(_ee_xz(q_loc) - TARGET) < 1e-4
        # Block THAT branch: obstacle disk right on its elbow.
        obstacle = (_elbow_xz(q_loc), 0.3)
        # The local solution now (provably) violates the obstacle...
        assert np.linalg.norm(_elbow_xz(q_loc) - obstacle[0]) < 0.3
        # ...and the MIP finds the mirror branch: clear AND on target.
        q_glob, info = planar_global_ik_mip(
            [1.0, 1.0], TARGET, obstacles=[obstacle]
        )
        assert info["mip_success"], info
        assert info["clear"], info
        assert info["ee_error"] < 1e-6, info
        assert (
            np.linalg.norm(_elbow_xz(q_glob) - obstacle[0]) >= 0.3 - 1e-9
        )
        np.testing.assert_allclose(_ee_xz(q_glob), TARGET, atol=1e-6)
        # It is genuinely the other branch.
        assert np.sign(q_glob[1]) != np.sign(q_loc[1])

