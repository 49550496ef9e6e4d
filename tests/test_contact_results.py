"""ContactResults reporting tests (contact/contact_results.py — the
ContactResultsToLcmSystem role, reference
multibody/plant/contact_results_to_lcm.h)."""

import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import contact_results as cr
from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.io import messages as m
from drake_tpu.io.pubsub import PubSub
from drake_tpu.multibody.model import FLOATING, ModelBuilder
from drake_tpu.systems import simulator

F64 = jnp.float64


def _settled_ball(hydro=False):
    radius, mass = 0.05, 0.5
    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    b.add_body(
        "ball", parent=None, joint_type=FLOATING, mass=mass,
        inertia_com=np.eye(3) * 0.4 * mass * radius**2,
    )
    model, params = b.build(F64)
    extra = dict(hydroelastic_modulus=5e6, hydro_rings=1) if hydro else {}
    geoms = [
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=0.5),
        CollisionGeometry(name="ball_geom", body=0,
                          shape=sh.Sphere(radius), friction=0.5,
                          stiffness=1e6, dissipation=0.1, **extra),
    ]
    scene = CollisionScene.build(geoms)
    h = 1e-3
    dsys = cplant.make_discrete_system(model, params, scene, h)
    x0 = model.default_state(F64).at[6].set(radius * 0.999)
    us = jnp.zeros((400, 0), dtype=F64)
    xs = simulator.simulate_discrete(dsys, params, x0, us)
    q = xs[-1, :7]
    _, _, sol, contact = cplant.step_with_forces(
        model, params, scene, q, jnp.zeros(6, F64), jnp.zeros(6, F64), h
    )
    return model, scene, contact, sol, h, mass


class TestPointPair:
    def test_resting_ball_reports_weight(self):
        model, scene, contact, sol, h, mass = _settled_ball()
        out = cr.build_contact_results(
            model, scene, contact, np.asarray(sol.gamma), h, t=0.4
        )
        assert out.timestamp == 400000
        assert len(out.hydroelastic_contacts) == 0
        assert len(out.point_pair_contact_info) == 1
        info = out.point_pair_contact_info[0]
        assert {info.body1_name, info.body2_name} == {"world", "ball"}
        # contact_force is f_Bc_W — the force on body 2 (the ball): it
        # balances gravity.  Tangential ~ 0.
        np.testing.assert_allclose(
            info.contact_force[2], mass * 9.81, rtol=1e-3
        )
        assert abs(info.contact_force[0]) < 1e-6 * mass * 9.81
        # normal is nhat_BA_W: from the ball (B) into the ground (A).
        np.testing.assert_allclose(info.normal, [0, 0, -1], atol=1e-12)
        # Contact point is on the ground plane under the ball.
        assert abs(info.contact_point[2]) < 5e-4

    def test_inactive_contacts_are_dropped(self):
        model, scene, contact, sol, h, _ = _settled_ball()
        out = cr.build_contact_results(
            model, scene, contact, np.zeros_like(np.asarray(sol.gamma)), h
        )
        assert out.point_pair_contact_info == []


class TestHydroelasticSurface:
    def test_patch_aggregates_to_weight(self):
        model, scene, contact, sol, h, mass = _settled_ball(hydro=True)
        out = cr.build_contact_results(
            model, scene, contact, np.asarray(sol.gamma), h
        )
        assert len(out.point_pair_contact_info) == 0
        assert len(out.hydroelastic_contacts) == 1
        surf = out.hydroelastic_contacts[0]
        assert surf.geometry2_name == "ball_geom"
        # force_C_W is F_Ac_W — the force on body 1 (the ground): the
        # ball's weight pressing down.
        np.testing.assert_allclose(surf.force_C_W[2], -mass * 9.81,
                                   rtol=1e-3)
        # Centroid under the ball center, on the patch.
        assert np.hypot(surf.centroid_W[0], surf.centroid_W[1]) < 1e-3
        # Per-point data covers the quadrature set consistently.
        npts = len(surf.p_WV)
        assert npts >= 1
        assert len(surf.quadrature_point_data) == npts
        assert surf.pressure.shape == (npts,)
        total = sum(q.traction_Aq_W[2]
                    for q in surf.quadrature_point_data)
        np.testing.assert_allclose(total, -mass * 9.81, rtol=1e-3)
        # Flat resting patch: moment about the centroid ~ 0.
        assert np.abs(surf.moment_C_W).max() < 2e-3

    def test_message_roundtrip_and_publish(self):
        model, scene, contact, sol, h, _ = _settled_ball(hydro=True)
        node = PubSub("memq://")
        pub = cr.ContactResultsPublisher(node, model, scene)
        sub = m.TypedSubscriber(node, "CONTACT_RESULTS",
                                m.lcmt_contact_results_for_viz)
        pub.publish(0.123, contact, sol.gamma, h)
        got = sub.poll()
        assert got is not None
        assert got.timestamp == 123000
        assert len(got.hydroelastic_contacts) == 1
        np.testing.assert_allclose(
            got.hydroelastic_contacts[0].force_C_W,
            cr.build_contact_results(
                model, scene, contact, np.asarray(sol.gamma), h
            ).hydroelastic_contacts[0].force_C_W,
        )


class TestSlotLayout:
    def test_layout_covers_all_slots(self):
        model, scene, contact, _, _, _ = _settled_ball()
        layout = cr.slot_layout(scene)
        assert layout[-1].start + layout[-1].count == contact.phi.shape[0]
