"""Four-bar linkage: kinematic-loop closure through SAP constraints.

The reference models loops by cutting them and adding a constraint
(examples/multibody/four_bar — a SapBallConstraint closes the loop;
multibody/topology graph->forest).  Same discipline here: a 3-link serial
chain plus a ball constraint pinning the coupler's far end back to a
world anchor.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry.scene import CollisionScene
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import ModelBuilder

F64 = jnp.float64

# Crank (L=1) at origin, coupler (L=2), rocker (L=1) anchored at (2, 0):
# a parallelogram-capable four-bar in the x-z plane (y = rotation axis).
L_CRANK, L_COUPLER, L_ROCKER = 1.0, 2.0, 1.0
ANCHOR = np.array([2.0, 0.0, 0.0])


def _build():
    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    b.add_body(
        "crank", parent=None, joint_type="revolute", mass=1.0,
        com=(0, 0, -L_CRANK / 2), inertia_com=np.diag([1 / 12, 1 / 12, 1e-3]),
        axis=(0, 1, 0),
    )
    b.add_body(
        "coupler", parent="crank", joint_type="revolute", mass=1.0,
        com=(L_COUPLER / 2, 0, 0),
        inertia_com=np.diag([1e-3, L_COUPLER**2 / 12, L_COUPLER**2 / 12]),
        axis=(0, 1, 0), X_PJ_xyz=(0, 0, -L_CRANK),
    )
    b.add_body(
        "rocker", parent="coupler", joint_type="revolute", mass=1.0,
        com=(0, 0, L_ROCKER / 2),
        inertia_com=np.diag([1 / 12, 1 / 12, 1e-3]),
        axis=(0, 1, 0), X_PJ_xyz=(L_COUPLER, 0, 0),
    )
    model, params = b.build(F64)
    scene = CollisionScene.build([])
    rocker_idx = model.body_index("rocker")
    dsys = cplant.make_discrete_system(
        model, params, scene, 2e-3,
        ball_constraints=[
            (rocker_idx, (0.0, 0.0, L_ROCKER), -1, tuple(ANCHOR))
        ],
    )
    return model, params, dsys


def _loop_error(model, params, q):
    R, p = kin.forward_kinematics(model, params, q)
    rocker = model.body_index("rocker")
    tip = p[rocker] + R[rocker] @ jnp.asarray([0.0, 0.0, L_ROCKER], F64)
    return float(jnp.linalg.norm(tip - jnp.asarray(ANCHOR, F64)))


class TestFourBar:
    def test_loop_stays_closed_through_dynamics(self):
        model, params, dsys = _build()
        # Start at the closed configuration: crank down, coupler across,
        # rocker up — q = (0, 90deg, 90deg) puts the rocker tip at the
        # anchor... verify, then simulate.
        q0 = jnp.asarray([0.0, 0.0, 0.0], F64)
        assert _loop_error(model, params, q0) < 1e-12
        x = jnp.concatenate([q0, jnp.zeros(3, F64)])
        # q0 is a neutral equilibrium (parallelogram) — drive the crank.
        u = jnp.asarray([3.0, 0.0, 0.0], F64)
        step = jax.jit(lambda xx: dsys.g(params, xx, u))
        errs = []
        for _ in range(500):
            x = step(x)
            errs.append(_loop_error(model, params, x[:3]))
        assert np.isfinite(np.asarray(x)).all()
        assert max(errs) < 2e-3  # loop closed within constraint tolerance
        # The mechanism actually moved (the crank torque drives it).
        assert float(jnp.abs(x[0])) > 0.05

    def test_one_dof_motion(self):
        """A four-bar has one DOF: joint velocities stay on the constraint
        manifold — the ball constraint removes 2 of 3 rates (x-z plane)."""
        model, params, dsys = _build()
        q0 = jnp.asarray([0.0, 0.0, 0.0], F64)
        x = jnp.concatenate([q0, jnp.zeros(3, F64)])
        u = jnp.asarray([3.0, 0.0, 0.0], F64)
        step = jax.jit(lambda xx: dsys.g(params, xx, u))
        for _ in range(100):
            x = step(x)
        q, v = x[:3], x[3:]
        # Tip velocity of the rocker end ~ 0 (holonomic constraint rate).
        def tip(qq):
            R, p = kin.forward_kinematics(model, params, qq)
            i = model.body_index("rocker")
            return p[i] + R[i] @ jnp.asarray([0.0, 0.0, L_ROCKER], F64)

        J = jax.jacfwd(tip)(q)
        tip_vel = J @ v
        speed = float(jnp.linalg.norm(v))
        assert speed > 1e-3  # it IS moving
        assert float(jnp.linalg.norm(tip_vel)) < 0.05 * max(speed, 1.0)
