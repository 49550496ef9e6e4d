"""SAP contact solver tests.

Mirrors the reference's SAP test strategy (multibody/contact_solvers/sap/test/
sap_solver_test.cc — analytic stiction ('PizzaSaver') and friction-cone
checks; sap/validate_constraint_gradients.h): projection vs numerical
optimization, gradient identities, analytic rigid-body contact physics
(resting, stiction threshold, sliding deceleration), and IFT gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.contact import plant as cplant
from drake_tpu.contact import sap
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder
from drake_tpu.systems import simulator

F64 = jnp.float64


def make_ball(mu=0.5, radius=0.05, mass=0.5, gravity=(0.0, 0.0, -9.81)):
    b = ModelBuilder(gravity=gravity)
    b.add_body(
        "ball", parent=None, joint_type=FLOATING, mass=mass,
        inertia_com=np.eye(3) * 0.4 * mass * radius**2,
    )
    model, params = b.build(F64)
    geoms = [
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=mu),
        CollisionGeometry(name="ball", body=0, shape=sh.Sphere(radius),
                          friction=mu, stiffness=1e6, dissipation=0.1),
    ]
    scene = CollisionScene.build(geoms)
    return model, params, scene, radius, mass


class TestProjection:
    def test_gradient_identity_all_regions(self):
        """d l / d vc == -gamma (the property Drake validates with
        ValidateConstraintGradients)."""
        rng = np.random.default_rng(0)
        for _ in range(20):
            vc = jnp.asarray(rng.normal(size=3))
            Rt = abs(rng.normal()) + 0.01
            Rn = abs(rng.normal()) + 0.01
            R = jnp.asarray([Rt, Rt, Rn])
            vhat = jnp.asarray(rng.normal(size=3))
            mu = abs(rng.normal()) + 0.1
            g = jax.grad(lambda v: sap._contact_cost(v, R, vhat, mu)[0])(vc)
            gamma = sap._contact_cost(vc, R, vhat, mu)[1]
            np.testing.assert_allclose(g, -gamma, atol=1e-12)

    def test_projection_in_cone(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            y = jnp.asarray(rng.normal(size=3) * 2)
            R = jnp.asarray([0.1, 0.1, 0.5])
            mu = 0.7
            g = sap._project_gamma(y, R, mu)
            assert float(jnp.hypot(g[0], g[1])) <= mu * float(g[2]) + 1e-10

    def test_hessian_psd(self):
        """G = -dgamma/dvc must be PSD (convexity of the SAP cost)."""
        rng = np.random.default_rng(2)
        R = jnp.asarray([0.1, 0.1, 0.5])
        vhat = jnp.zeros(3)
        mu = 0.7
        for _ in range(20):
            vc = jnp.asarray(rng.normal(size=3))
            G = -jax.jacfwd(
                lambda v: sap._project_gamma((vhat - v) / R, R, mu)
            )(vc)
            eigs = np.linalg.eigvalsh(np.asarray(0.5 * (G + G.T)))
            assert eigs.min() > -1e-10


class TestBallOnGround:
    def test_resting_contact(self):
        model, params, scene, r, m = make_ball()
        dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
        x0 = model.default_state(F64).at[6].set(0.2)
        us = jnp.zeros((600, 0), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)
        assert abs(float(xs[-1, 6]) - r) < 1e-4  # rests at z = radius
        assert abs(float(xs[-1, 12])) < 1e-8  # zero vertical velocity
        # No penetration blow-through on impact.
        assert float(xs[:, 6].min()) > r - 5e-4

    @staticmethod
    def _settle(model, params, scene, h, steps=300):
        """Scan to the compliant resting equilibrium; returns settled q."""
        dsys = cplant.make_discrete_system(model, params, scene, h)
        x0 = model.default_state(F64).at[6].set(0.05)
        us = jnp.zeros((steps, 0), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)
        return xs[-1, :7]

    def test_normal_impulse_at_rest(self):
        """Settled resting contact: impulse = m g h (momentum balance)."""
        model, params, scene, r, m = make_ball()
        h = 1e-3
        q = self._settle(model, params, scene, h)
        v = jnp.zeros(6, dtype=F64)
        _, v1, sol, _ = cplant.step_with_forces(
            model, params, scene, q, v, jnp.zeros(6, F64), h
        )
        np.testing.assert_allclose(
            float(sol.gamma[0, 2]), m * 9.81 * h, rtol=1e-3
        )
        assert float(jnp.abs(v1).max()) < 1e-6

    @staticmethod
    def _make_cube(mu, mass=0.5, side=0.1):
        b = ModelBuilder()
        I = mass * side**2 / 6.0
        b.add_body("cube", parent=None, joint_type=FLOATING, mass=mass,
                   inertia_com=np.eye(3) * I)
        model, params = b.build(F64)
        geoms = [
            CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                              friction=mu),
            CollisionGeometry(name="cube", body=0,
                              shape=sh.Box((side, side, side)),
                              friction=mu, stiffness=1e6, dissipation=0.1),
        ]
        scene = CollisionScene.build(geoms)
        return model, params, scene, side

    @staticmethod
    def _settle_cube(model, params, scene, h, z0, steps=300):
        dsys = cplant.make_discrete_system(model, params, scene, h)
        x0 = model.default_state(F64).at[6].set(z0)
        us = jnp.zeros((steps, 0), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)
        return xs[-1, :7]

    def test_stiction_below_friction_limit(self):
        """A cube pushed below mu*m*g must stick (PizzaSaver-style check;
        a sphere would roll, so the flat contact patch is essential)."""
        mu = 0.5
        m = 0.5
        model, params, scene, side = self._make_cube(mu, mass=m)
        h = 1e-3
        q = self._settle_cube(model, params, scene, h, side / 2)
        v = jnp.zeros(6, dtype=F64)
        fx = 0.9 * mu * m * 9.81
        fext = jnp.zeros((1, 6), dtype=F64).at[0, 3].set(fx)
        data, contact = sap.assemble(
            model, params, scene, q, v, jnp.zeros(6, F64), h,
            external_forces_W=fext,
        )
        sol = sap.solve_sap(data, data.v_star)
        # Regularized stiction: residual slip ~ Rt * gamma_t, not exactly 0.
        slip_scale = float(jnp.max(data.R[:, 0])) * fx * h
        assert float(jnp.abs(sol.v[3])) < 10 * slip_scale
        # Momentum balance: push impulse = friction impulse + slip momentum.
        gt_total = float(jnp.linalg.norm(jnp.sum(sol.gamma[:, :2], axis=0)))
        slip_momentum = m * float(jnp.abs(sol.v[3]))
        np.testing.assert_allclose(gt_total + slip_momentum, fx * h, rtol=1e-6)

    def test_sliding_cube_decelerates_at_mu_g(self):
        """A cube sliding at 1 m/s decelerates at mu*g until it stops
        (steady Coulomb sliding; no rolling possible for a flat patch)."""
        mu = 0.3
        m = 0.5
        model, params, scene, side = self._make_cube(mu, mass=m)
        h = 1e-3
        q = self._settle_cube(model, params, scene, h, side / 2)
        dsys = cplant.make_discrete_system(model, params, scene, h)
        x0 = jnp.concatenate([q, jnp.zeros(6, F64)]).at[10].set(1.0)
        n_steps = 250
        us = jnp.zeros((n_steps, 0), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)
        vx = np.asarray(xs[:, 10])
        # Deceleration slope over the steady sliding phase (skip the initial
        # compliant-impact transient in the first ~100 steps).
        a = (vx[220] - vx[120]) / (100 * h)
        np.testing.assert_allclose(a, -mu * 9.81, rtol=2e-2)
        # Eventually stops (within the horizon: 1/(mu g) = 0.34 s).
        assert abs(vx[-1]) < 0.31

    def test_slide_to_roll_transition(self):
        """Textbook: a sphere sliding at v0 transitions to pure rolling at
        exactly 5/7 v0 (independent of mu) and then rolls at constant speed.
        NOTE floating-joint velocities are body-frame; convert to world."""
        from drake_tpu.math import rotations as rot

        mu = 0.3
        model, params, scene, r, m = make_ball(mu=mu)
        dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
        x0 = model.default_state(F64).at[6].set(r).at[10].set(1.0)  # vx = 1
        us = jnp.zeros((300, 0), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)

        def world_v(x):
            R = rot.quat_to_rotation(x[:4])
            return R @ x[10:13], R @ x[7:10]

        v_end, w_end = world_v(xs[-1])
        np.testing.assert_allclose(float(v_end[0]), 5.0 / 7.0, atol=0.02)
        # Pure rolling: slip = vx - r*wy ~ 0.
        slip = float(v_end[0] - r * w_end[1])
        assert abs(slip) < 1e-3


class TestGradients:
    def test_ift_gradient_through_step(self):
        """d v_next / d v0 via the custom_vjp matches finite differences."""
        model, params, scene, r, m = make_ball()
        h = 1e-3
        q = model.default_state(F64)[:7].at[6].set(r + 1e-5)

        def step_vx(v0x):
            v0 = jnp.zeros(6, dtype=F64).at[3].set(v0x)
            data, _ = sap.assemble(
                model, params, scene, q, v0, jnp.zeros(6, F64), h
            )
            sol = sap.solve_sap(data, data.v_star)
            return sol.v[3]

        g = jax.grad(step_vx)(jnp.asarray(0.5, F64))
        eps = 1e-6
        fd = (step_vx(jnp.asarray(0.5 + eps, F64)) - step_vx(jnp.asarray(0.5 - eps, F64))) / (
            2 * eps
        )
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)

    def test_vmap_batch_steps(self):
        model, params, scene, r, m = make_ball()
        dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
        rng = np.random.default_rng(3)
        x0 = model.default_state(F64).at[6].set(r)
        x0s = jnp.tile(x0[None], (8, 1))
        x0s = x0s.at[:, 10].set(jnp.asarray(rng.uniform(0, 2, 8)))
        xs = jax.vmap(lambda x: dsys.g(params, x, jnp.zeros(0, F64), 0.0))(x0s)
        assert xs.shape == (8, 13)
        assert bool(jnp.all(jnp.isfinite(xs)))


class TestJointLimits:
    def test_swing_into_limit_stops(self):
        """SAP joint-limit constraint (sap_limit_constraint role): a swinging
        joint must stop at its limit with only near-rigid compliance."""
        from drake_tpu.geometry.scene import CollisionScene
        from drake_tpu.multibody.model import ModelBuilder, REVOLUTE

        b = ModelBuilder()
        b.add_body(
            "arm", parent=None, joint_type=REVOLUTE, mass=1.0, com=(0, 0, -0.5),
            inertia_com=np.diag([0, 0.01, 0]), axis=(0, 1, 0), damping=0.05,
        )
        model, params = b.build(F64)
        scene = CollisionScene.build([])
        lims = (jnp.asarray([-0.5]), jnp.asarray([0.5]))
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3, joint_limits=lims
        )
        us = jnp.zeros((1500, 1), dtype=F64)
        xs = simulator.simulate_discrete(
            dsys, params, jnp.array([0.4, 3.0], dtype=F64), us
        )
        assert float(xs[:, 0].max()) < 0.501  # stops at the limit
        assert float(xs[:, 0].min()) > -0.501
        assert bool(jnp.all(jnp.isfinite(xs)))


class TestCouplerConstraint:
    def test_coupled_joints_track_ratio(self):
        """SAP coupler constraint (sap_coupler_constraint role): two pendulum
        joints locked at ratio 2:1 (gripper-mimic style) stay coupled as
        gravity swings them."""
        from drake_tpu.geometry.scene import CollisionScene
        from drake_tpu.multibody.model import ModelBuilder, REVOLUTE

        b = ModelBuilder()
        b.add_body(
            "arm_a", parent=None, joint_type=REVOLUTE, mass=1.0,
            com=(0, 0, -0.4), inertia_com=np.diag([0, 0.01, 0]),
            axis=(0, 1, 0), damping=0.1, joint_name="ja",
            X_PJ_xyz=(0.0, 0.0, 0.0),
        )
        b.add_body(
            "arm_b", parent=None, joint_type=REVOLUTE, mass=2.0,
            com=(0, 0, -0.3), inertia_com=np.diag([0, 0.02, 0]),
            axis=(0, 1, 0), damping=0.1, joint_name="jb",
            X_PJ_xyz=(0.5, 0.0, 0.0),
        )
        model, params = b.build(F64)
        scene = CollisionScene.build([])
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3,
            couplers=[("ja", "jb", 2.0, 0.0)],  # q_a = 2 q_b
        )
        # Start coupled-consistent: q_a = 0.6, q_b = 0.3, and let them swing.
        x0 = jnp.array([0.6, 0.3, 0.0, 0.0], dtype=F64)
        us = jnp.zeros((1000, 2), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x0, us)
        # The ratio holds throughout the swing.
        err = np.asarray(jnp.abs(xs[:, 0] - 2.0 * xs[:, 1]))
        assert err.max() < 1e-3
        # And the joints actually moved (the constraint didn't just freeze).
        assert float(jnp.abs(xs[-1, 0] - 0.6)) > 0.05


class TestHolonomicConstraints:
    """Distance/ball/weld equality families (sap_distance/ball/weld
    constraint roles, sap_driver.cc:423,512,607)."""

    def _floating_box(self):
        from drake_tpu.multibody.model import ModelBuilder, FLOATING

        b = ModelBuilder()
        b.add_body(
            "box", parent=None, joint_type=FLOATING, mass=1.0,
            inertia_com=np.eye(3) * 0.01,
        )
        model, params = b.build(F64)
        scene = CollisionScene.build([])
        return model, params, scene

    def test_ball_constraint_acts_as_pivot(self):
        """A floating box ball-constrained at an offset point to a world
        anchor swings like a pendulum: the anchor point must not move."""
        model, params, scene = self._floating_box()
        anchor_W = (0.0, 0.0, 1.0)
        p_B = (0.0, 0.0, 0.3)  # constrained point in body frame
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3,
            ball_constraints=[(0, p_B, -1, anchor_W)],
        )
        # Start with the body hanging 0.3 below the anchor, kicked sideways.
        q0 = jnp.array([1, 0, 0, 0, 0.0, 0.0, 0.7], dtype=F64)
        v0 = jnp.array([0, 0, 0, 0.5, 0.0, 0.0], dtype=F64)
        x = jnp.concatenate([q0, v0])
        us = jnp.zeros((500, 0), dtype=F64)
        xs = simulator.simulate_discrete(dsys, params, x, us)
        from drake_tpu.multibody import kinematics as kin
        from drake_tpu.math import rotations as rot

        x_end = xs[-1]
        qn = x_end[:7]
        R = rot.quat_to_rotation(qn[:4])
        p_WP = qn[4:7] + R @ jnp.asarray(p_B, F64)
        err = np.linalg.norm(np.asarray(p_WP) - np.asarray(anchor_W))
        assert err < 1e-3, f"pivot drifted {err}"
        # And it genuinely moved (swung), i.e. not just frozen.
        assert abs(float(x_end[4])) + abs(float(x_end[6] - 0.7)) > 1e-3
        assert bool(jnp.all(jnp.isfinite(xs)))

    def test_distance_constraint_holds_length(self):
        model, params, scene = self._floating_box()
        anchor_W = (0.0, 0.0, 1.0)
        d0 = 0.4
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3,
            distance_constraints=[(0, (0, 0, 0), -1, anchor_W, d0)],
        )
        q0 = jnp.array([1, 0, 0, 0, 0.0, 0.0, 0.6], dtype=F64)
        v0 = jnp.array([0, 0, 0, 0.8, 0.0, 0.0], dtype=F64)
        us = jnp.zeros((500, 0), dtype=F64)
        xs = simulator.simulate_discrete(
            dsys, params, jnp.concatenate([q0, v0]), us
        )
        p = np.asarray(xs[-1][4:7]) - np.asarray(anchor_W)
        assert abs(np.linalg.norm(p) - d0) < 1e-3
        assert bool(jnp.all(jnp.isfinite(xs)))

    def test_weld_constraint_holds_pose(self):
        """A floating box welded to a world pose stays there under gravity."""
        model, params, scene = self._floating_box()
        eye = np.eye(3)
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3,
            weld_constraints=[(0, eye, (0, 0, 0), -1, eye, (0.2, 0.1, 0.5))],
        )
        q0 = jnp.array([1, 0, 0, 0, 0.2, 0.1, 0.5], dtype=F64)
        v0 = jnp.zeros(6, F64)
        us = jnp.zeros((300, 0), dtype=F64)
        xs = simulator.simulate_discrete(
            dsys, params, jnp.concatenate([q0, v0]), us
        )
        p_err = np.linalg.norm(np.asarray(xs[-1][4:7]) - np.array([0.2, 0.1, 0.5]))
        quat_err = np.linalg.norm(np.asarray(xs[-1][:4]) - np.array([1, 0, 0, 0]))
        assert p_err < 1e-3, f"weld translation drifted {p_err}"
        assert quat_err < 1e-3, f"weld rotation drifted {quat_err}"


class TestImplicitPd:
    """Effort-limited implicit PD actuation (sap_pd_controller_constraint)."""

    def _arm(self):
        from drake_tpu.multibody.model import ModelBuilder, REVOLUTE

        b = ModelBuilder()
        b.add_body(
            "arm", parent=None, joint_type=REVOLUTE, mass=1.0,
            com=(0, 0, -0.5), inertia_com=np.diag([0, 0.01, 0]),
            axis=(0, 1, 0), damping=0.0, joint_name="j",
        )
        model, params = b.build(F64)
        return model, params, CollisionScene.build([])

    def test_servo_reaches_target(self):
        model, params, scene = self._arm()
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3,
            pd_joints=[("j", 200.0, 20.0, 100.0)],
        )
        assert dsys.num_inputs == 1  # desired position only
        us = jnp.full((3000, 1), 0.8, dtype=F64)
        xs = simulator.simulate_discrete(
            dsys, params, jnp.zeros(2, F64), us
        )
        # Steady state: Kp (qd - q) = m g l sin(q) -> small offset from 0.8.
        assert abs(float(xs[-1, 0]) - 0.8) < 0.05
        assert bool(jnp.all(jnp.isfinite(xs)))

    def test_effort_limit_respected(self):
        """With a tiny effort limit the servo cannot hold the arm against
        gravity: it settles near hanging, not at the target."""
        model, params, scene = self._arm()
        # Holding 0.8 rad: need ~ m g l sin(0.8) = 3.5 Nm; limit 1 Nm.
        dsys = cplant.make_discrete_system(
            model, params, scene, 1e-3,
            pd_joints=[("j", 200.0, 20.0, 1.0)],
        )
        us = jnp.full((4000, 1), 0.8, dtype=F64)
        xs = simulator.simulate_discrete(
            dsys, params, jnp.zeros(2, F64), us
        )
        # Equilibrium with tau = 1: sin(q) = 1/(m g l) ~ 0.204 -> q ~ 0.205.
        assert float(xs[-1, 0]) < 0.3, "servo exceeded its effort limit"
        assert bool(jnp.all(jnp.isfinite(xs)))


class TestPgs:
    """PGS baseline matches SAP on contact-only problems (the
    pgs_solver.h cross-check role)."""

    def _sphere_data(self, vx=0.3):
        """ONE contact (falling, sliding sphere on the ground): the LCP
        solution is unique, so PGS and SAP must agree to O(R)."""
        import numpy as np

        from drake_tpu.geometry import shapes as sh
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        from drake_tpu.multibody.model import ModelBuilder

        b = ModelBuilder()
        b.add_body(
            "ball", parent=None, joint_type="floating", mass=1.0,
            inertia_com=np.eye(3) * (0.4 * 0.1**2),
        )
        model, params = b.build(jnp.float64)
        geoms = [
            CollisionGeometry(
                name="ball", body=0, shape=sh.Sphere(0.1),
                friction=0.5, stiffness=1e6, dissipation=10.0,
            ),
            CollisionGeometry(
                name="ground", body=-1, shape=sh.HalfSpace(),
                friction=0.5, stiffness=1e6, dissipation=10.0,
            ),
        ]
        scene = CollisionScene.build(geoms)
        q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.1 - 1e-4], jnp.float64)
        v0 = jnp.asarray([0, 0, 0, vx, 0.0, -0.5], jnp.float64)
        data, _ = sap.assemble(
            model, params, scene, q, v0, jnp.zeros(6, jnp.float64), 0.01
        )
        return data

    def test_matches_sap_unique_solution(self):
        """Single contact -> unique solution: PGS == SAP up to the O(R_n
        gamma_n) compliance difference (PGS enforces vc_n = vhat_n
        EXACTLY; SAP's near-rigid regularization leaves ~ R_n gamma_n)."""
        from drake_tpu.contact.pgs import solve_pgs

        data = self._sphere_data()
        sol_sap = sap.solve_sap(data, data.v_star)
        Rn_gn = float(data.R[0, 2] * sol_sap.gamma[0, 2])
        for method in ("jacobi", "gs"):
            sol_pgs = solve_pgs(data, iterations=400, method=method)
            np.testing.assert_allclose(
                np.asarray(sol_pgs.v), np.asarray(sol_sap.v),
                atol=2 * Rn_gn + 5e-3, err_msg=method,
            )
            # Tangential impulses agree tightly (Rt << Rn).
            np.testing.assert_allclose(
                np.asarray(sol_pgs.gamma[:, :2]),
                np.asarray(sol_sap.gamma[:, :2]),
                atol=5e-4, err_msg=method,
            )
            # Exact complementarity: the ball separates at vhat_n.
            vc_n = float((data.J[0] @ sol_pgs.v)[2])
            np.testing.assert_allclose(
                vc_n, float(data.vhat[0, 2]), atol=1e-9
            )

    def test_sliding_friction_cone_binds(self):
        """Fast slide: the tangential impulse sits exactly on the Coulomb
        disk (|gamma_t| = mu gamma_n)."""
        from drake_tpu.contact.pgs import solve_pgs

        data = self._sphere_data(vx=3.0)
        sol = solve_pgs(data, iterations=800, method="gs")
        gt = np.asarray(sol.gamma[0, :2])
        gn = float(sol.gamma[0, 2])
        np.testing.assert_allclose(np.linalg.norm(gt), 0.5 * gn, rtol=1e-6)

    def test_converges_fast_single_contact(self):
        from drake_tpu.contact.pgs import solve_pgs

        data = self._sphere_data()
        r = float(
            solve_pgs(data, iterations=20, method="gs").momentum_residual
        )
        assert r < 1e-10


class TestTamsi:
    """TAMSI baseline (tamsi_solver.h role): matches SAP at physics level
    on unique-solution problems; Stribeck stiction below v_s."""

    def _sphere(self, vx=0.3):
        import numpy as np

        from drake_tpu.geometry import shapes as sh
        from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
        from drake_tpu.multibody.model import ModelBuilder

        b = ModelBuilder()
        b.add_body(
            "ball", parent=None, joint_type="floating", mass=1.0,
            inertia_com=np.eye(3) * (0.4 * 0.1**2),
        )
        model, params = b.build(jnp.float64)
        geoms = [
            CollisionGeometry(
                name="ball", body=0, shape=sh.Sphere(0.1),
                friction=0.5, stiffness=1e5, dissipation=0.1,
            ),
            CollisionGeometry(
                name="ground", body=-1, shape=sh.HalfSpace(),
                friction=0.5, stiffness=1e10, dissipation=0.1,
            ),
        ]
        scene = CollisionScene.build(geoms)
        q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.1 - 2e-4], jnp.float64)
        v0 = jnp.asarray([0, 0, 0, vx, 0.0, -0.2], jnp.float64)
        data, contact = sap.assemble(
            model, params, scene, q, v0, jnp.zeros(6, jnp.float64), 0.01
        )
        return data, contact

    def test_matches_sap_velocities(self):
        from drake_tpu.contact.tamsi import solve_tamsi

        data, contact = self._sphere()
        sol_sap = sap.solve_sap(data, data.v_star)
        sol_t = solve_tamsi(data, contact, 0.01)
        # Different regularizations (SAP R vs TAMSI compliance-in-residual):
        # velocities agree to the regularization scale.
        np.testing.assert_allclose(
            np.asarray(sol_t.v), np.asarray(sol_sap.v), atol=2e-2
        )
        assert float(sol_t.momentum_residual) < 1e-7

    def test_stiction_below_tolerance(self):
        """Slip far below v_stiction: the regularized friction holds the
        tangential velocity near zero (no drift blow-up)."""
        from drake_tpu.contact.tamsi import solve_tamsi

        data, contact = self._sphere(vx=1e-6)
        sol = solve_tamsi(data, contact, 0.01, v_stiction=1e-4)
        # Tangential CONTACT velocity stays within the stiction tolerance.
        vc = jnp.einsum("cij,j->ci", data.J, sol.v)
        assert float(jnp.abs(vc[0, :2]).max()) < 2e-4

    def test_normal_force_compliant_law(self):
        """At rest the normal force balances: fn = k x (1 - d vn) with
        vn ~ 0 -> settled penetration x = mg/k."""
        from drake_tpu.contact.tamsi import solve_tamsi

        data, contact = self._sphere(vx=0.0)
        sol = solve_tamsi(data, contact, 0.01)
        fn = float(sol.gamma[0, 2]) / 0.01
        # The ball is falling at 0.2 m/s: the solve absorbs the momentum;
        # fn h ~= m (dv + g h).
        dv = 0.2 + float(sol.v[5])
        np.testing.assert_allclose(
            fn * 0.01, 1.0 * (dv + 9.81 * 0.01), rtol=1e-6
        )


class TestFullJointZooAssembly:
    """sap.assemble must accept EVERY joint type in the zoo (the planar
    case crashed before round 4 — advisor finding on planar_gripper)."""

    def _one_joint_model(self, joint_type, **kw):
        b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
        b.add_body(
            "body", parent=None, joint_type=joint_type, mass=0.5,
            inertia_com=np.eye(3) * 1e-3, damping=0.2, **kw,
        )
        model, params = b.build(F64)
        scene = CollisionScene.build(
            [CollisionGeometry(name="body", body=0, shape=sh.Sphere(0.05),
                               friction=0.5, stiffness=1e5)]
        )
        return model, params, scene

    @pytest.mark.parametrize(
        "joint_type,kw",
        [
            ("planar", {}),
            ("ball", {}),
            ("screw", {"axis": (0.0, 0.0, 1.0)}),
        ],
    )
    def test_assemble_and_damping(self, joint_type, kw):
        model, params, scene = self._one_joint_model(joint_type, **kw)
        h = 0.01
        dsys = cplant.make_discrete_system(model, params, scene, h)
        x = model.default_state(F64)
        nq = model.num_positions
        v0 = 0.3
        x = x.at[nq:].set(v0)  # every dof moving
        x1 = dsys.g(params, x, jnp.zeros(0, F64))
        assert bool(jnp.all(jnp.isfinite(x1)))
        # Implicit per-dof damping: v1 = v0 * (M / (M + h D)) per diagonal
        # dof -- strictly decays, never crosses zero in one step.
        v1 = np.asarray(x1[nq:])
        assert (np.abs(v1) < v0 + 1e-12).all()
        assert (v1 > 0.0).all()
