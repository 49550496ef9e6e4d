"""Multibody tree engine tests.

Mirrors the reference's analytic-fixture strategy (multibody/benchmarks/
acrobot — the same double-pendulum closed forms used to validate
MultibodyTree): CRBA/RNEA vs hand-derived dynamics, RNEA<->M consistency,
energy conservation, URDF round-trip, and a floating-base momentum check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.models import acrobot
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody import parsing
from drake_tpu.multibody import plant as mb_plant
from drake_tpu.multibody.model import (
    FLOATING,
    PRISMATIC,
    REVOLUTE,
    WELD,
    ModelBuilder,
)
from drake_tpu.systems import simulator

F64 = jnp.float64


def acrobot_tree():
    """Tree model equivalent to examples/acrobot/acrobot_plant.cc defaults."""
    b = ModelBuilder()
    b.add_body(
        "link1", parent=None, joint_type=REVOLUTE, mass=1.0, com=(0, 0, -0.5),
        inertia_com=np.diag([0, 0.083, 0]), axis=(0, 1, 0), damping=0.1,
        joint_name="shoulder",
    )
    b.add_body(
        "link2", parent="link1", joint_type=REVOLUTE, mass=1.0, com=(0, 0, -1.0),
        inertia_com=np.diag([0, 0.33, 0]), X_PJ_xyz=(0, 0, -1.0), axis=(0, 1, 0),
        damping=0.1, joint_name="elbow",
    )
    return b.build(F64)


ACROBOT_URDF = """
<robot name="acrobot">
  <link name="link1">
    <inertial>
      <origin xyz="0 0 -0.5"/>
      <mass value="1.0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0.083" iyz="0" izz="0"/>
    </inertial>
  </link>
  <link name="link2">
    <inertial>
      <origin xyz="0 0 -1.0"/>
      <mass value="1.0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0.33" iyz="0" izz="0"/>
    </inertial>
  </link>
  <joint name="shoulder" type="continuous">
    <parent link="world_link"/>
    <child link="link1"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.1"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="link1"/>
    <child link="link2"/>
    <origin xyz="0 0 -1.0"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.1"/>
    <limit lower="-3" upper="3" effort="20" velocity="10"/>
  </joint>
  <link name="world_link"/>
</robot>
"""


class TestAgainstAnalyticAcrobot:
    def setup_method(self):
        self.model, self.params = acrobot_tree()
        self.ap = acrobot.default_params(F64)

    def test_mass_matrix(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            q = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
            np.testing.assert_allclose(
                dyn.mass_matrix(self.model, self.params, q),
                acrobot.mass_matrix(self.ap, q),
                atol=1e-12,
            )

    def test_bias_forces(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            q = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
            v = jnp.asarray(rng.normal(size=2))
            np.testing.assert_allclose(
                dyn.bias_forces(self.model, self.params, q, v),
                acrobot.bias_term(self.ap, q, v),
                atol=1e-12,
            )

    def test_forward_dynamics(self):
        rng = np.random.default_rng(2)
        for _ in range(10):
            q = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
            v = jnp.asarray(rng.normal(size=2))
            u = jnp.asarray(rng.normal(size=1))
            vd = dyn.forward_dynamics(
                self.model, self.params, q, v, jnp.array([0.0, u[0]])
            )
            vd_ana = acrobot.dynamics(self.ap, jnp.concatenate([q, v]), u)[2:]
            np.testing.assert_allclose(vd, vd_ana, atol=1e-11)

    def test_energy(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
        v = jnp.asarray(rng.normal(size=2))
        np.testing.assert_allclose(
            dyn.total_energy(self.model, self.params, q, v),
            acrobot.total_energy(self.ap, jnp.concatenate([q, v])),
            atol=1e-12,
        )

    def test_rnea_crba_consistency(self):
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.uniform(-1, 1, 2))
        v = jnp.asarray(rng.normal(size=2))
        vd = jnp.asarray(rng.normal(size=2))
        tau = dyn.inverse_dynamics(self.model, self.params, q, v, vd)
        tau2 = dyn.mass_matrix(self.model, self.params, q) @ vd + dyn.bias_forces(
            self.model, self.params, q, v
        )
        np.testing.assert_allclose(tau, tau2, atol=1e-11)

    def test_plant_system_simulation(self):
        system = mb_plant.make_system(self.model, self.params)
        assert system.num_inputs == 2  # both revolute joints actuated by default
        ana = acrobot.make_system(acrobot.default_params(F64))
        x0 = jnp.array([0.3, -0.6, 0.1, 0.2], dtype=F64)
        us = jnp.zeros((500, 2), dtype=F64)
        xs, _ = simulator.simulate(system, self.params, x0, us, 1e-3)
        us1 = jnp.zeros((500, 1), dtype=F64)
        xs_ana, _ = simulator.simulate(ana, ana.default_params, x0, us1, 1e-3)
        np.testing.assert_allclose(xs[-1], xs_ana[-1], atol=1e-9)


class TestUrdf:
    def test_round_trip_matches_builder(self):
        model_u, params_u = parsing.parse_urdf(ACROBOT_URDF, dtype=F64)
        model_b, params_b = acrobot_tree()
        # world_link is parsed as the root body (massless weld) + 2 links.
        assert model_u.num_positions == 2
        assert model_u.num_velocities == 2
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
        v = jnp.asarray(rng.normal(size=2))
        np.testing.assert_allclose(
            dyn.mass_matrix(model_u, params_u, q),
            dyn.mass_matrix(model_b, params_b, q),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            dyn.bias_forces(model_u, params_u, q, v),
            dyn.bias_forces(model_b, params_b, q, v),
            atol=1e-12,
        )

    def test_joint_limits(self):
        lims = parsing.joint_limits(ACROBOT_URDF)
        assert lims["elbow"]["effort"] == 20.0
        assert lims["elbow"]["lower"] == -3.0


class TestFloatingBase:
    def make_free_body(self):
        b = ModelBuilder()
        b.add_body(
            "brick", parent=None, joint_type=FLOATING, mass=2.0,
            com=(0.0, 0.0, 0.0),
            inertia_com=np.diag([0.01, 0.02, 0.03]),
        )
        return b.build(F64)

    def test_free_fall(self):
        model, params = self.make_free_body()
        system = mb_plant.make_system(model, params)
        x0 = model.default_state(F64)
        us = jnp.zeros((100, 0), dtype=F64)
        xs, ts = simulator.simulate(system, params, x0, us, 1e-2)
        # z(t) = -g t^2 / 2 (z is q[6] for a floating joint at origin).
        z = xs[-1, 6]
        t = ts[-1]
        np.testing.assert_allclose(z, -0.5 * 9.81 * t**2, rtol=1e-6)

    def test_energy_and_momentum_conservation_tumbling(self):
        """Zero gravity: spinning free body conserves energy and |angular
        momentum| (Dzhanibekov-style tumbling is the hard case)."""
        model, params = self.make_free_body()
        params = params.replace(gravity=jnp.zeros(3, dtype=F64))
        system = mb_plant.make_system(model, params)
        x0 = model.default_state(F64)
        # Spin mostly about the unstable middle axis.
        nq = model.num_positions
        x0 = x0.at[nq : nq + 3].set(jnp.array([0.01, 5.0, 0.01], dtype=F64))
        us = jnp.zeros((4000, 0), dtype=F64)
        xs, _ = simulator.simulate(system, params, x0, us, 5e-4, method="rk4")

        def energy(x):
            return dyn.kinetic_energy(model, params, x[:nq], x[nq:])

        E0 = energy(xs[0])
        E1 = energy(xs[-1])
        np.testing.assert_allclose(float(E1), float(E0), rtol=1e-7)

        def ang_mom_world(x):
            q, v = x[:nq], x[nq:]
            R_WB, _ = kin.forward_kinematics(model, params, q)
            I = params.inertia_com[0]
            L_B = I @ v[:3]
            return R_WB[0] @ L_B

        L0 = ang_mom_world(xs[0])
        L1 = ang_mom_world(xs[-1])
        np.testing.assert_allclose(L1, L0, atol=1e-6)


class TestPrismaticAndMixed:
    def test_cart_pole_tree(self):
        """Cart (prismatic x) + pole (revolute y) matches the analytic
        cart-pole model."""
        from drake_tpu.models import cart_pole

        b = ModelBuilder()
        b.add_body("cart", parent=None, joint_type=PRISMATIC, mass=10.0,
                   axis=(1, 0, 0))
        # Axis -y so positive theta swings the pole toward +x, matching the
        # analytic model's convention (com_x = +l sin(theta)).
        b.add_body("pole", parent="cart", joint_type=REVOLUTE, mass=1.0,
                   com=(0, 0, -0.5), axis=(0, -1, 0))
        model, params = b.build(F64)
        cp = cart_pole.default_params(F64)
        rng = np.random.default_rng(6)
        for _ in range(5):
            q = jnp.asarray(rng.uniform(-1, 1, 2))
            v = jnp.asarray(rng.normal(size=2))
            u = jnp.asarray(rng.normal(size=1))
            vd_tree = dyn.forward_dynamics(
                model, params, q, v, jnp.array([u[0], 0.0])
            )
            vd_ana = cart_pole.dynamics(cp, jnp.concatenate([q, v]), u)[2:]
            np.testing.assert_allclose(vd_tree, vd_ana, atol=1e-11)

    def test_vmap_and_grad(self):
        model, params = acrobot_tree()
        rng = np.random.default_rng(7)
        qs = jnp.asarray(rng.uniform(-1, 1, (16, 2)))
        Ms = jax.vmap(lambda q: dyn.mass_matrix(model, params, q))(qs)
        assert Ms.shape == (16, 2, 2)
        g = jax.grad(
            lambda q: dyn.total_energy(model, params, q, jnp.zeros(2, F64))
        )(qs[0])
        assert g.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestSdf:
    CART_POLE_SDF = """
<sdf version="1.7">
<model name="cart_pole">
  <link name="cart"><inertial><mass>10.0</mass></inertial></link>
  <link name="pole">
    <inertial><pose>0 0 -0.5 0 0 0</pose><mass>1.0</mass></inertial>
  </link>
  <joint name="slider" type="prismatic">
    <parent>world</parent><child>cart</child>
    <axis><xyz>1 0 0</xyz></axis>
  </joint>
  <joint name="pin" type="revolute">
    <parent>cart</parent><child>pole</child>
    <axis><xyz>0 -1 0</xyz>
      <limit><lower>-3.0</lower><upper>3.0</upper></limit>
    </axis>
  </joint>
</model>
</sdf>
"""

    def test_sdf_cart_pole_matches_analytic(self):
        from drake_tpu.models import cart_pole
        from drake_tpu.multibody import parsing_sdf

        model, params = parsing_sdf.parse_sdf(self.CART_POLE_SDF, dtype=F64)
        cp = cart_pole.default_params(F64)
        rng = np.random.default_rng(0)
        for _ in range(5):
            q = jnp.asarray(rng.uniform(-1, 1, 2))
            v = jnp.asarray(rng.normal(size=2))
            u = jnp.asarray(rng.normal(size=1))
            vd = dyn.forward_dynamics(model, params, q, v, jnp.array([u[0], 0.0]))
            vd_ana = cart_pole.dynamics(cp, jnp.concatenate([q, v]), u)[2:]
            np.testing.assert_allclose(vd, vd_ana, atol=1e-10)

    def test_sdf_joint_limits(self):
        from drake_tpu.multibody import parsing_sdf

        model, _ = parsing_sdf.parse_sdf(self.CART_POLE_SDF, dtype=F64)
        lo, hi = parsing_sdf.sdf_joint_limits(model, self.CART_POLE_SDF, F64)
        assert lo[1] == -3.0 and hi[1] == 3.0
        assert np.isinf(float(lo[0]))

    @pytest.mark.skipif(
        not __import__("os").path.exists(
            "/root/reference/examples/multibody/cart_pole/cart_pole.sdf"
        ),
        reason="reference tree not mounted",
    )
    def test_reference_cart_pole_sdf_file(self):
        """Parse the reference's actual cart_pole.sdf (as data, read-only)."""
        from drake_tpu.models import cart_pole
        from drake_tpu.multibody import parsing_sdf

        model, params = parsing_sdf.parse_sdf(
            "/root/reference/examples/multibody/cart_pole/cart_pole.sdf",
            dtype=F64,
        )
        assert model.num_positions == 2
        cp = cart_pole.default_params(F64)
        q = jnp.asarray([0.3, 0.7])
        v = jnp.asarray([0.5, -1.2])
        vd = dyn.forward_dynamics(model, params, q, v, jnp.array([2.0, 0.0]))
        vd_ana = cart_pole.dynamics(cp, jnp.concatenate([q, v]), jnp.asarray([2.0]))[2:]
        # Axis sign conventions may differ; compare magnitudes of coupling.
        np.testing.assert_allclose(np.abs(vd), np.abs(vd_ana), atol=1e-8)
