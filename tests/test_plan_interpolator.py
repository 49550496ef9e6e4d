"""RobotPlanInterpolator (manipulation/util/robot_plan_interpolator.h role):
plan ingestion from the wire schema, all interpolator types, hold
behavior, and a closed-loop tracking check through the iiwa PD driver."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.io.messages import decode, encode, lcmt_robot_plan
from drake_tpu.manipulation.plan_interpolator import (
    InterpolatorType,
    RobotPlanInterpolator,
    encode_plan,
)

F64 = jnp.float64


class TestPlanInterpolator:
    def _plan(self):
        times = np.asarray([0.0, 1.0, 2.0])
        qs = np.asarray([[0.0, 0.0], [0.5, -0.2], [1.0, 0.3]])
        return times, qs

    def test_wire_roundtrip_and_cubic(self):
        times, qs = self._plan()
        msg = decode(lcmt_robot_plan, encode(encode_plan(times, qs)))
        itp = RobotPlanInterpolator(2, InterpolatorType.Cubic)
        itp.handle_message(msg)
        # Hits every knot...
        for t, qk in zip(times, qs):
            np.testing.assert_allclose(
                np.asarray(itp.state(t)[0]), qk, atol=1e-9
            )
        # ...smoothly: velocity is continuous across the middle knot.
        v_lo = np.asarray(itp.state(1.0 - 1e-6)[1])
        v_hi = np.asarray(itp.state(1.0 + 1e-6)[1])
        np.testing.assert_allclose(v_lo, v_hi, atol=1e-3)
        # Clamped beyond the span.
        np.testing.assert_allclose(
            np.asarray(itp.state(5.0)[0]), qs[-1], atol=1e-9
        )
        assert itp.end_time == 2.0

    def test_foh_and_zoh(self):
        times, qs = self._plan()
        foh = RobotPlanInterpolator(2, InterpolatorType.FirstOrderHold)
        foh.set_plan(times, qs)
        np.testing.assert_allclose(
            np.asarray(foh.state(0.5)[0]), 0.5 * (qs[0] + qs[1]), atol=1e-9
        )
        zoh = RobotPlanInterpolator(2, InterpolatorType.ZeroOrderHold)
        zoh.set_plan(times, qs)
        np.testing.assert_allclose(
            np.asarray(zoh.state(0.5)[0]), qs[0], atol=1e-9
        )

    def test_empty_plan_holds(self):
        itp = RobotPlanInterpolator(2)
        times, qs = self._plan()
        itp.set_plan(times, qs)
        itp.handle_message(lcmt_robot_plan())  # empty -> hold at last q
        q, v = itp.state(10.0)
        np.testing.assert_allclose(np.asarray(q), qs[-1], atol=1e-9)
        np.testing.assert_allclose(np.asarray(v), 0.0)

    def test_acceleration_consistency(self):
        times, qs = self._plan()
        itp = RobotPlanInterpolator(2, InterpolatorType.Cubic)
        itp.set_plan(times, qs)
        # a ~= dv/dt by finite difference mid-segment.
        t = 0.7
        a = np.asarray(itp.acceleration(t))
        eps = 1e-5
        a_fd = (
            np.asarray(itp.state(t + eps)[1])
            - np.asarray(itp.state(t - eps)[1])
        ) / (2 * eps)
        np.testing.assert_allclose(a, a_fd, atol=1e-5)


class TestPlanRunnerLoop:
    def test_iiwa_tracks_plan(self):
        """kuka_plan_runner role: a wire plan drives the iiwa under
        computed-torque control; the arm reaches the final knot."""
        from drake_tpu.models import iiwa
        from drake_tpu.multibody import dynamics as dyn

        q0 = np.asarray(iiwa.home_position(F64))
        qf = q0 + 0.15
        plan = encode_plan([0.0, 1.0], np.stack([q0, qf]))
        itp = RobotPlanInterpolator(7, InterpolatorType.Cubic)
        itp.handle_message(decode(lcmt_robot_plan, encode(plan)))

        model, params = iiwa.make_model(F64)
        h = 2e-3
        ts = np.arange(0.0, 1.3, h)
        qd = jnp.asarray(np.stack([np.asarray(itp.state(t)[0]) for t in ts]))
        vd = jnp.asarray(np.stack([np.asarray(itp.state(t)[1]) for t in ts]))
        ad = jnp.asarray(
            np.stack([np.asarray(itp.acceleration(t)) for t in ts])
        )
        kp, kd = 100.0, 20.0

        def step(x, ref):
            qd_k, vd_k, ad_k = ref
            q, v = x[:7], x[7:]
            acc_des = ad_k + kp * (qd_k - q) + kd * (vd_k - v)
            M = dyn.mass_matrix(model, params, q)
            C = dyn.bias_forces(model, params, q, v)
            tau = M @ acc_des + C
            vdot = dyn.forward_dynamics(model, params, q, v, tau)
            return jnp.concatenate([q + h * v, v + h * vdot]), ()

        x0 = jnp.concatenate([jnp.asarray(q0, F64), jnp.zeros(7, F64)])
        xf, _ = jax.lax.scan(jax.jit(step), x0, (qd, vd, ad))
        np.testing.assert_allclose(np.asarray(xf[:7]), qf, atol=5e-3)
