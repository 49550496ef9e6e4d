"""Tests for trajectories, primitives, controllers, estimators, IK, and the
collision checker (the supporting-component inventory of SURVEY.md §2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.control import controllers, estimators
from drake_tpu.geometry import collision_checker as cc
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.math.trajectories import BsplineTrajectory, PiecewisePolynomial
from drake_tpu.models import iiwa, pendulum
from drake_tpu.multibody import ik
from drake_tpu.systems import primitives, simulator

F64 = jnp.float64


class TestTrajectories:
    def test_first_order_hold(self):
        breaks = jnp.asarray([0.0, 1.0, 2.0])
        samples = jnp.asarray([[0.0], [2.0], [1.0]])
        pp = PiecewisePolynomial.first_order_hold(breaks, samples)
        np.testing.assert_allclose(float(pp.value(0.5)[0]), 1.0)
        np.testing.assert_allclose(float(pp.value(1.5)[0]), 1.5)
        np.testing.assert_allclose(float(pp.value(5.0)[0]), 1.0)  # clamped

    def test_cubic_hermite_interpolates(self):
        breaks = jnp.linspace(0.0, jnp.pi, 8, dtype=F64)
        y = jnp.sin(breaks)[:, None]
        yd = jnp.cos(breaks)[:, None]
        pp = PiecewisePolynomial.cubic_hermite(breaks, y, yd)
        ts = jnp.linspace(0, jnp.pi, 50, dtype=F64)
        np.testing.assert_allclose(
            pp.vector_values(ts)[:, 0], jnp.sin(ts), atol=2e-3
        )
        np.testing.assert_allclose(
            float(pp.derivative_value(1.0)[0]), np.cos(1.0), atol=1e-3
        )

    def test_natural_cubic_c2(self):
        breaks = jnp.asarray([0.0, 1.0, 2.0, 3.0])
        y = jnp.asarray([[0.0], [1.0], [-1.0], [0.5]])
        pp = PiecewisePolynomial.cubic_with_continuous_second_derivatives(
            breaks, y
        )
        # Interpolates samples.
        for t, yi in zip(breaks, y):
            np.testing.assert_allclose(float(pp.value(t)[0]), float(yi[0]), atol=1e-10)
        # First derivative continuous across interior breaks.
        eps = 1e-6
        for tb in [1.0, 2.0]:
            d_left = float(pp.derivative_value(tb - eps)[0])
            d_right = float(pp.derivative_value(tb + eps)[0])
            assert abs(d_left - d_right) < 1e-3

    def test_bspline(self):
        cps = jnp.asarray([[0.0], [0.0], [1.0], [1.0]])
        bs = BsplineTrajectory.make_clamped_uniform(cps, order=4, t0=0.0, tf=1.0)
        np.testing.assert_allclose(float(bs.value(0.0)[0]), 0.0, atol=1e-9)
        np.testing.assert_allclose(float(bs.value(1.0 - 1e-9)[0]), 1.0, atol=1e-6)
        mid = float(bs.value(0.5)[0])
        assert 0.4 < mid < 0.6


class TestPrimitives:
    def test_linear_system_sim(self):
        A = jnp.asarray([[0.0, 1.0], [-4.0, 0.0]])
        B = jnp.zeros((2, 1))
        sys = primitives.linear_system(A, B)
        x0 = jnp.asarray([1.0, 0.0])
        us = jnp.zeros((1000, 1))
        xs, ts = simulator.simulate(sys, None, x0, us, 1e-3)
        # Harmonic oscillator omega=2: x(1) = cos(2).
        np.testing.assert_allclose(float(xs[-1, 0]), np.cos(2.0), atol=1e-4)

    def test_mlp(self):
        params = primitives.mlp_init(jax.random.PRNGKey(0), [3, 16, 2])
        y = primitives.mlp_apply(params, jnp.ones(3))
        assert y.shape == (2,)
        grads = jax.grad(lambda p: jnp.sum(primitives.mlp_apply(p, jnp.ones(3)) ** 2))(params)
        assert grads.weights[0].shape == (3, 16)


class TestControllersAndEstimators:
    def test_pid_regulates_pendulum(self):
        sys = pendulum.make_system(pendulum.default_params(F64))
        p = sys.default_params
        q_d = jnp.asarray([0.5], F64)
        policy = controllers.pid_controller(
            jnp.asarray([20.0]), jnp.asarray([10.0]), jnp.asarray([5.0]),
            lambda t: (q_d, jnp.zeros(1, F64)), dt=1e-3,
        )
        x0 = jnp.zeros(2, F64)
        xs, us, _ = simulator.simulate_controlled(
            sys, p, x0, policy, 6000, 1e-3, policy_state=jnp.zeros(1, F64)
        )
        # Integral action kills the gravity-induced steady-state error.
        assert abs(float(xs[-1, 0]) - 0.5) < 1e-2

    def test_discrete_kalman_filter_converges(self):
        rng = np.random.default_rng(0)
        A = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
        C = jnp.asarray([[1.0, 0.0]])
        W = 0.01 * jnp.eye(2)
        V = 0.1 * jnp.eye(1)
        gains = estimators.discrete_kalman_filter(A, C, W, V)
        # Run the filter on synthetic data.
        x = jnp.asarray([1.0, -0.5])
        xhat = jnp.zeros(2)
        for k in range(200):
            w = jnp.asarray(rng.normal(size=2) * 0.01)
            v = jnp.asarray(rng.normal(size=1) * 0.1)
            y = C @ x + v
            xhat = A @ xhat + gains.L @ (y - C @ xhat)
            x = A @ x + w
        assert float(jnp.linalg.norm(x - xhat)) < 0.5

    def test_luenberger_observer(self):
        sys = pendulum.make_system(pendulum.default_params(F64))
        p = sys.default_params
        C = jnp.asarray([[1.0, 0.0]], F64)
        L = jnp.asarray([[20.0], [50.0]], F64)
        update = estimators.luenberger_observer(sys, p, L, C, dt=1e-3)
        from drake_tpu.systems import integrators

        step = integrators.get("rk4")
        u = jnp.zeros(1, F64)

        def body(carry, k):
            x, xhat = carry
            t = k * 1e-3
            y = C @ x
            xhat = update(xhat, u, y, t)
            x = step(sys.f, p, x, u, t, 1e-3)
            return (x, xhat), None

        (x, xhat), _ = jax.lax.scan(
            body, (jnp.asarray([0.4, 0.0], F64), jnp.zeros(2, F64)),
            jnp.arange(3000),
        )
        assert float(jnp.linalg.norm(x - xhat)) < 5e-3


class TestIk:
    @pytest.fixture(scope="class")
    def arm(self):
        return iiwa.make_model(F64)

    def test_differential_ik_reaches_target(self, arm):
        model, params = arm
        q = iiwa.home_position(F64)
        ee = model.body_index("link7")
        p_start = ik.frame_position(model, params, q, ee)
        p_target = p_start + jnp.asarray([0.05, 0.03, -0.04], F64)

        def body(_, q):
            res = ik.differential_ik_step(model, params, q, p_target, ee, gain=2.0)
            return q + 0.05 * res.v

        q = jax.jit(lambda q: jax.lax.fori_loop(0, 200, body, q))(q)
        res = ik.differential_ik_step(model, params, q, p_target, ee, gain=2.0)
        assert float(jnp.linalg.norm(res.position_error)) < 1e-4

    def test_nlp_ik(self, arm):
        model, params = arm
        q0 = iiwa.home_position(F64)
        ee = model.body_index("link7")
        p_target = ik.frame_position(model, params, q0, ee) + jnp.asarray(
            [0.08, -0.05, 0.02], F64
        )
        lim = jnp.asarray(iiwa.POSITION_LIMITS, F64)
        res = ik.solve_ik(
            model, params, q0, ee, p_target, q_lower=-lim, q_upper=lim
        )
        assert bool(res.success)
        p_sol = ik.frame_position(model, params, res.z, ee)
        np.testing.assert_allclose(
            np.asarray(p_sol), np.asarray(p_target), atol=1e-5
        )


class TestCollisionChecker:
    def test_iiwa_ground_checks(self):
        model, params = iiwa.make_model(F64)
        scene = iiwa.make_contact_scene(model)
        q_home = iiwa.home_position(F64)
        assert bool(cc.check_config(model, params, scene, q_home))
        # Fold the arm down into the ground: collision.
        q_down = q_home.at[1].set(2.0).at[3].set(0.0)
        assert not bool(cc.check_config(model, params, scene, q_down))

    def test_batched_and_edges(self):
        model, params = iiwa.make_model(F64)
        scene = iiwa.make_contact_scene(model)
        q_home = iiwa.home_position(F64)
        q_down = q_home.at[1].set(2.0).at[3].set(0.0)
        qs = jnp.stack([q_home, q_down])
        free = cc.check_configs(model, params, scene, qs)
        assert bool(free[0]) and not bool(free[1])
        assert not bool(
            cc.check_edge(model, params, scene, q_home, q_down, num_samples=8)
        )

    def test_visibility_graph(self):
        """planning/visibility_graph.h role: all-pairs edge checks."""
        model, params = iiwa.make_model(F64)
        scene = iiwa.make_contact_scene(model)
        q_home = iiwa.home_position(F64)
        q_near = q_home.at[0].add(0.2)
        q_down = q_home.at[1].set(2.0).at[3].set(0.0)
        pts = jnp.stack([q_home, q_near, q_down])
        adj = cc.visibility_graph(model, params, scene, pts, num_samples=8)
        assert adj.shape == (3, 3)
        assert bool(adj[0, 1]) and bool(adj[1, 0])  # symmetric, free edge
        # every edge touching the in-collision point is unusable
        assert not bool(adj[0, 2]) and not bool(adj[2, 2])
        assert not bool(adj[2, 1])


class TestDiagram:
    def test_cascade_integrator_chain(self):
        """Two cascaded integrators = double integrator."""
        from drake_tpu.systems import diagram

        integ = primitives.linear_system(
            jnp.zeros((1, 1)), jnp.ones((1, 1))
        )
        double = diagram.cascade(integ, integ)
        assert double.num_states == 2
        x0 = jnp.zeros(2)
        us = jnp.ones((1000, 1))
        xs, _ = simulator.simulate(
            double.with_params((None, None)), (None, None), x0, us, 1e-3
        )
        # x1 = t, x2 = t^2/2 at t=1.
        np.testing.assert_allclose(float(xs[-1, 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(xs[-1, 1]), 0.5, atol=1e-3)

    def test_feedback_stabilizes(self):
        """P-feedback around an unstable first-order plant."""
        from drake_tpu.systems import diagram

        plant = primitives.linear_system(
            jnp.asarray([[1.0]]), jnp.asarray([[1.0]])
        )
        closed = diagram.feedback(
            plant, lambda p, y, r, t: 5.0 * (r - y)
        )
        x0 = jnp.asarray([1.0])
        rs = jnp.zeros((2000, 1))
        xs, _ = simulator.simulate(closed, None, x0, rs, 1e-3)
        assert abs(float(xs[-1, 0])) < 1e-3  # stabilized to r=0


class TestStochasticSchema:
    """common/schema/stochastic.h role (io/schema.py)."""

    def test_sample_and_yaml_roundtrip(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from drake_tpu.io import schema

        g = schema.Gaussian(mean_value=[1.0, 2.0], stddev=0.5)
        u = schema.Uniform(min_value=0.0, max_value=2.0)
        d = schema.UniformDiscrete(values=(0.1, 0.2, 0.3))
        for dist in (g, u, d):
            back = schema.from_yaml_value(schema.to_yaml_value(dist))
            assert type(back) is type(dist)
        assert isinstance(schema.from_yaml_value(3.5), schema.Deterministic)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 2000)
        samples = jax.vmap(u.sample)(ks)
        assert 0.9 < float(samples.mean()) < 1.1
        assert float(samples.min()) >= 0.0 and float(samples.max()) <= 2.0
        gs = jax.vmap(g.sample)(ks)
        np.testing.assert_allclose(
            np.asarray(gs.mean(axis=0)), [1.0, 2.0], atol=0.05
        )

    def test_sample_tree(self):
        import jax

        from drake_tpu.io import schema

        cfg = {
            "mass": schema.Gaussian(mean_value=1.0, stddev=0.1),
            "name": "robot",
            "mu": schema.Uniform(min_value=0.2, max_value=0.8),
        }
        out = schema.sample_tree(cfg, jax.random.PRNGKey(1))
        assert out["name"] == "robot"
        assert 0.2 <= float(out["mu"]) <= 0.8
        out2 = schema.sample_tree(cfg, jax.random.PRNGKey(2))
        assert float(out2["mass"]) != float(out["mass"])


class TestProfiling:
    def test_time_fn_and_staged(self):
        import jax
        import jax.numpy as jnp

        from drake_tpu.analysis.profiling import Staged, time_fn

        f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x))
        t = time_fn(f, jnp.ones((64, 64)))
        assert t["compile_s"] > 0 and t["run_s"] > 0
        assert t["compile_s"] >= t["run_s"] * 0.5
        st = Staged()
        with st.stage("a"):
            sum(range(1000))
        with st.stage("b"):
            sum(range(100))
        rep = st.report()
        assert "a" in rep and "TOTAL" in rep


class TestBezierCurve:
    """common/trajectories/bezier_curve.h semantics."""

    def test_endpoints_and_linear_case(self):
        from drake_tpu.math.trajectories import BezierCurve

        pts = jnp.array([[0.0, 0.0], [1.0, 2.0]])
        c = BezierCurve(breaks=jnp.array([1.0, 3.0]), control_points=pts)
        np.testing.assert_allclose(np.asarray(c.value(1.0)), [0.0, 0.0],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c.value(3.0)), [1.0, 2.0],
                                   atol=1e-6)
        # order-1 Bezier is linear interpolation
        np.testing.assert_allclose(np.asarray(c.value(2.0)), [0.5, 1.0],
                                   atol=1e-6)

    def test_matches_de_casteljau_cubic(self):
        from drake_tpu.math.trajectories import BezierCurve

        pts = np.array([[0.0], [1.0], [-1.0], [2.0]])
        c = BezierCurve(breaks=jnp.array([0.0, 1.0]),
                        control_points=jnp.asarray(pts))

        def casteljau(p, s):
            p = p.copy()
            while len(p) > 1:
                p = [(1 - s) * a + s * b for a, b in zip(p[:-1], p[1:])]
            return p[0]

        for s in [0.1, 0.35, 0.72, 0.9]:
            np.testing.assert_allclose(
                np.asarray(c.value(s)), casteljau(list(pts), s), atol=1e-5)

    def test_derivative_matches_autodiff(self):
        from drake_tpu.math.trajectories import BezierCurve

        pts = jnp.array([[0.0], [1.0], [-1.0], [2.0]])
        c = BezierCurve(breaks=jnp.array([0.0, 2.0]), control_points=pts)
        t = 0.77
        ad = jax.jacfwd(c.value)(t)
        np.testing.assert_allclose(np.asarray(c.derivative_value(t)),
                                   np.asarray(ad), atol=1e-4)


class TestPiecewiseQuaternionSlerp:
    """common/trajectories/piecewise_quaternion.h semantics."""

    def _make(self):
        from drake_tpu.math import rotations as rot
        from drake_tpu.math.trajectories import PiecewiseQuaternionSlerp

        qs = jnp.stack([
            rot.quat_identity(jnp.float64),
            rot.rotation_to_quat(rot.rot_z(jnp.pi / 2)),
            rot.rotation_to_quat(rot.rot_z(jnp.pi)),
        ])
        return PiecewiseQuaternionSlerp.make(jnp.array([0.0, 1.0, 2.0]), qs)

    def test_interpolates_on_geodesic(self):
        from drake_tpu.math import rotations as rot

        traj = self._make()
        # halfway through segment 0: rotation by pi/4 about z
        q = traj.orientation(0.5)
        R = rot.quat_to_rotation(q)
        np.testing.assert_allclose(
            np.asarray(R), np.asarray(rot.rot_z(jnp.pi / 4)), atol=1e-6)

    def test_angular_velocity_constant_per_segment(self):
        traj = self._make()
        w = traj.angular_velocity(0.3)
        np.testing.assert_allclose(np.asarray(w), [0, 0, np.pi / 2],
                                   atol=1e-6)

    def test_sign_alignment_takes_short_way(self):
        from drake_tpu.math import rotations as rot
        from drake_tpu.math.trajectories import PiecewiseQuaternionSlerp

        q0 = rot.quat_identity(jnp.float64)
        q1 = -rot.rotation_to_quat(rot.rot_z(0.2))  # flipped sign
        traj = PiecewiseQuaternionSlerp.make(
            jnp.array([0.0, 1.0]), jnp.stack([q0, q1]))
        w = traj.angular_velocity(0.5)
        assert abs(float(jnp.linalg.norm(w)) - 0.2) < 1e-6


class TestPiecewisePose:
    def test_pose_and_velocity(self):
        from drake_tpu.math import rotations as rot
        from drake_tpu.math.trajectories import PiecewisePose

        breaks = jnp.array([0.0, 1.0, 2.0])
        positions = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [1.0, 1, 0]])
        quats = jnp.stack([
            rot.quat_identity(jnp.float64),
            rot.rotation_to_quat(rot.rot_x(0.5)),
            rot.rotation_to_quat(rot.rot_x(1.0)),
        ])
        traj = PiecewisePose.make(breaks, positions, quats)
        X = traj.value(0.0)
        np.testing.assert_allclose(np.asarray(X.p), [0, 0, 0], atol=1e-9)
        X = traj.value(2.0)
        np.testing.assert_allclose(np.asarray(X.p), [1, 1, 0], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(X.R), np.asarray(rot.rot_x(1.0)), atol=1e-6)
        v = traj.velocity(1.5)
        assert v.shape == (6,)
        np.testing.assert_allclose(np.asarray(v[:3]), [0.5, 0, 0], atol=1e-6)


class TestPiecewiseDerivativeTrajectory:
    def test_derivative_matches_derivative_value(self):
        from drake_tpu.math.trajectories import PiecewisePolynomial

        breaks = jnp.array([0.0, 1.0, 2.5, 4.0])
        samples = jnp.array([[0.0], [1.0], [-1.0], [2.0]])
        traj = PiecewisePolynomial.cubic_with_continuous_second_derivatives(
            breaks, samples)
        dtraj = traj.derivative()
        for t in [0.1, 0.9, 1.7, 3.3]:
            np.testing.assert_allclose(
                np.asarray(dtraj.value(t)),
                np.asarray(traj.derivative_value(t)), atol=1e-12)
        # second derivative via chaining
        ddtraj = dtraj.derivative()
        np.testing.assert_allclose(
            np.asarray(ddtraj.value(1.7)),
            np.asarray(traj.derivative_value(1.7, order=2)), atol=1e-12)
