"""Global IK (multi-start batched NLP — the GlobalInverseKinematics role).

Reference: multibody/inverse_kinematics/global_inverse_kinematics.h escapes
local minima via an MIP rotation relaxation; the TPU design point is dense
multi-start (see solve_global_ik docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.multibody import ik
from drake_tpu.multibody.model import REVOLUTE, ModelBuilder

F64 = jnp.float64


def two_link_arm():
    """Planar 2-link arm in the x-z plane, links of length 1."""
    b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body(
        "link1", parent=None, joint_type=REVOLUTE, mass=1.0, com=(0, 0, -0.5),
        inertia_com=np.diag([0.1, 0.1, 0.01]), axis=(0, 1, 0),
        joint_name="shoulder",
    )
    b.add_body(
        "link2", parent="link1", joint_type=REVOLUTE, mass=1.0,
        com=(0, 0, -0.5), inertia_com=np.diag([0.1, 0.1, 0.01]),
        X_PJ_xyz=(0, 0, -1.0), axis=(0, 1, 0), joint_name="elbow",
    )
    return b.build(F64)


def ee_position(model, params, q):
    return ik.frame_position(
        model, params, q, model.body_index("link2"),
        p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
    )


class TestGlobalIk:
    def test_finds_reachable_target(self):
        model, params = two_link_arm()
        q_true = jnp.asarray([2.2, -1.7], F64)
        target = ee_position(model, params, q_true)
        res = ik.solve_global_ik(
            model, params, jax.random.PRNGKey(0), num_starts=16,
            body_index=model.body_index("link2"), p_target=target,
            p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
            q_lower=jnp.asarray([-np.pi, -np.pi], F64),
            q_upper=jnp.asarray([np.pi, np.pi], F64),
        )
        assert bool(res.success)
        assert int(res.n_feasible) >= 2  # elbow-up AND elbow-down basins
        p = ee_position(model, params, res.q)
        np.testing.assert_allclose(np.asarray(p), np.asarray(target),
                                   atol=1e-4)

    def test_beats_single_start_from_bad_basin(self):
        """A start pointing away from the target: plain IK gets stuck at a
        fold (or a worse posture); multi-start recovers the true target."""
        model, params = two_link_arm()
        # Target close to the base: requires a folded elbow (|q2| ~ 2.7).
        q_true = jnp.asarray([0.4, 2.7], F64)
        target = ee_position(model, params, q_true)
        q_bad = jnp.asarray([-3.0, 0.0], F64)  # arm extended, pointing away
        single = ik.solve_ik(
            model, params, q_bad, model.body_index("link2"), target,
            p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
            q_lower=jnp.asarray([-np.pi, -np.pi], F64),
            q_upper=jnp.asarray([np.pi, np.pi], F64),
        )
        multi = ik.solve_global_ik(
            model, params, jax.random.PRNGKey(1), num_starts=16,
            body_index=model.body_index("link2"), p_target=target,
            p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
            q_lower=jnp.asarray([-np.pi, -np.pi], F64),
            q_upper=jnp.asarray([np.pi, np.pi], F64),
        )
        assert bool(multi.success)
        assert float(multi.constraint_violation) <= float(
            single.constraint_violation
        ) + 1e-9
        p = ee_position(model, params, multi.q)
        np.testing.assert_allclose(np.asarray(p), np.asarray(target),
                                   atol=1e-4)

    def test_unreachable_target_reports_failure(self):
        model, params = two_link_arm()
        target = jnp.asarray([3.5, 0.0, 0.0], F64)  # beyond 2-link reach
        res = ik.solve_global_ik(
            model, params, jax.random.PRNGKey(2), num_starts=8,
            body_index=model.body_index("link2"), p_target=target,
            p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
        )
        assert not bool(res.success)
        assert float(res.constraint_violation) > 1.0  # ~1.5 short of reach

    def test_jits(self):
        model, params = two_link_arm()
        target = ee_position(model, params, jnp.asarray([1.0, 0.5], F64))

        @jax.jit
        def run(key, tgt):
            return ik.solve_global_ik(
                model, params, key, num_starts=8,
                body_index=model.body_index("link2"), p_target=tgt,
                p_BQ=jnp.asarray([0.0, 0.0, -1.0], F64),
            )

        res = run(jax.random.PRNGKey(3), target)
        assert bool(res.success)
