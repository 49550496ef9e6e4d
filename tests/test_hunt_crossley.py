"""Hunt-Crossley SAP constraint tests (kLagged / kSimilar).

Mirrors the reference's validation pattern for
sap_hunt_crossley_constraint.{h,cc}: the autodiff-derived impulse matches
the hand closed form, and the plant-level physics (settling, Coulomb
sliding) matches the analytic expectations the cone model already passes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.contact import sap
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

F64 = jnp.float64


def _hc_tuple(k=1e4, d=0.1, fe0=50.0, n0=0.4, eps=1e-4, h=0.01):
    return tuple(jnp.asarray(x, F64) for x in (k, d, fe0, n0, eps, h))


class TestHcImpulseFormulas:
    def test_normal_impulse_matches_closed_form(self):
        """gamma_n = h (fe0 - h k vn)+ (1 - d vn)+
        (sap_hunt_crossley_constraint.cc:116-133)."""
        hc = _hc_tuple()
        k, d, fe0, n0, eps, h = (float(x) for x in hc)
        mu = jnp.asarray(0.5, F64)
        for vn in [-0.5, -0.1, 0.0, 0.2, 5.0, 12.0]:
            vc = jnp.asarray([0.0, 0.0, vn], F64)
            g = sap._hc_gamma(vc, mu, hc, similar=False)
            fe = fe0 - h * k * vn
            damping = 1.0 - d * vn
            expected = h * max(fe, 0.0) * max(damping, 0.0)
            np.testing.assert_allclose(
                float(g[2]), expected, rtol=1e-9, atol=1e-12
            )
            # No tangential motion -> no friction impulse.
            np.testing.assert_allclose(np.asarray(g[:2]), 0.0, atol=1e-12)

    def test_lagged_friction_uses_n0(self):
        """kLagged: gamma_t = -mu n0 t_soft — independent of vn
        (DoCalcImpulse, cc:206-220)."""
        hc = _hc_tuple(n0=0.4, eps=1e-4)
        mu = jnp.asarray(0.5, F64)
        vt = 0.3
        vc = jnp.asarray([vt, 0.0, -0.2], F64)
        g = sap._hc_gamma(vc, mu, hc, similar=False)
        eps = 1e-4
        vt_soft = np.sqrt(vt**2 + eps**2) - eps
        t_soft = vt / (vt_soft + eps)
        np.testing.assert_allclose(
            float(g[0]), -0.5 * 0.4 * t_soft, rtol=1e-9
        )
        # Fast slip: |gamma_t| -> mu n0 (Coulomb bound).
        vc = jnp.asarray([10.0, 0.0, -0.2], F64)
        g = sap._hc_gamma(vc, mu, hc, similar=False)
        np.testing.assert_allclose(float(-g[0]), 0.5 * 0.4, rtol=1e-4)

    def test_similar_friction_uses_current_n(self):
        """kSimilar: gamma_t = -mu n(z) t_soft with z = vn - mu vt_soft."""
        hc = _hc_tuple()
        k, d, fe0, n0, eps, h = (float(x) for x in hc)
        mu_v = 0.5
        mu = jnp.asarray(mu_v, F64)
        vc = jnp.asarray([0.2, 0.0, -0.1], F64)
        g = sap._hc_gamma(vc, mu, hc, similar=True)
        vt_soft = np.sqrt(0.2**2 + eps**2) - eps
        z = -0.1 - mu_v * vt_soft
        n = h * max(fe0 - h * k * z, 0) * max(1 - d * z, 0)
        np.testing.assert_allclose(float(g[2]), n, rtol=1e-9)
        t_soft = 0.2 / (vt_soft + eps)
        np.testing.assert_allclose(float(g[0]), -mu_v * n * t_soft, rtol=1e-9)

    def test_cost_is_convex_along_lines(self):
        hc = _hc_tuple()
        mu = jnp.asarray(0.8, F64)
        rng = np.random.default_rng(0)
        for similar in (False, True):
            v0 = jnp.asarray(rng.standard_normal(3), F64)
            dv = jnp.asarray(rng.standard_normal(3), F64)
            f = lambda a: sap._hc_cost(v0 + a * dv, mu, hc, similar)
            a = jnp.linspace(-2.0, 2.0, 41)
            fpp = jax.vmap(jax.grad(jax.grad(f)))(a)
            assert float(jnp.min(fpp)) > -1e-8  # convex (PSD curvature)


def _box_world(contact_model):
    side = 0.2
    b = ModelBuilder()
    b.add_body(
        "box", parent=None, joint_type="floating", mass=1.0,
        inertia_com=np.eye(3) * (1.0 / 6.0 * 0.2**2),
    )
    model, params = b.build(F64)
    half = side / 2
    corners = [
        (sx * half, sy * half, -half)
        for sx in (-1, 1) for sy in (-1, 1)
    ]
    geoms = [
        CollisionGeometry(
            name=f"pt{i}", body=0, shape=sh.Sphere(1e-4),
            friction=0.5, stiffness=1e6, dissipation=10.0,
            p_BG=jnp.asarray(c, F64),
        )
        for i, c in enumerate(corners)
    ] + [
        CollisionGeometry(
            name="ground", body=-1, shape=sh.HalfSpace(),
            friction=0.5, stiffness=1e6, dissipation=10.0,
        )
    ]
    scene = CollisionScene.build(geoms)
    sp = sap.SapParameters(contact_model=contact_model)
    dsys = cplant.make_discrete_system(model, params, scene, 0.01, sap_params=sp)
    return model, params, dsys


class TestHcPlant:
    def _settle(self, contact_model, v0=(0, 0, 0)):
        model, params, dsys = _box_world(contact_model)
        x = model.default_state(F64)
        x = x.at[4 + 2].set(0.1 + 1e-4)  # z just touching
        x = x.at[7 + 3 : 7 + 6].set(jnp.asarray(v0, F64))
        step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
        for _ in range(120):
            x = step(x)
        return model, x

    def test_box_settles_on_ground_lagged(self):
        model, x = self._settle("hc_lagged")
        nq = model.num_positions
        # Resting: z stays near the surface, velocity ~ 0.
        assert abs(float(x[6]) - 0.1) < 2e-3
        assert float(jnp.max(jnp.abs(x[nq:]))) < 1e-4

    def test_box_settles_on_ground_similar(self):
        model, x = self._settle("hc_similar")
        nq = model.num_positions
        assert abs(float(x[6]) - 0.1) < 2e-3
        assert float(jnp.max(jnp.abs(x[nq:]))) < 1e-4

    def test_sliding_friction_coulomb(self):
        """Sliding cube decelerates at ~mu g under both HC models."""
        for cm in ("hc_lagged", "hc_similar"):
            model, params, dsys = _box_world(cm)
            x = model.default_state(F64)
            x = x.at[6].set(0.1)
            x = x.at[7 + 3].set(1.0)  # vx (body frame = world at identity)
            h = 0.01
            step = jax.jit(lambda xx: dsys.g(params, xx, jnp.zeros(0, F64)))
            for _ in range(20):
                x = step(x)
            vx = float(x[model.num_positions + 3])
            expected = 1.0 - 0.5 * 9.81 * 20 * h
            assert abs(vx - expected) < 0.03, (cm, vx, expected)

    def test_gradients_flow(self):
        model, params, dsys = _box_world("hc_lagged")
        x0 = model.default_state(F64).at[6].set(0.1)

        def loss(vz):
            x = x0.at[model.num_positions + 5].set(vz)
            x1 = dsys.g(params, x, jnp.zeros(0, F64))
            return jnp.sum(x1[model.num_positions :] ** 2)

        g = float(jax.grad(loss)(-0.5))
        eps = 1e-6
        fd = (loss(-0.5 + eps) - loss(-0.5 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, float(fd), rtol=1e-4, atol=1e-8)
