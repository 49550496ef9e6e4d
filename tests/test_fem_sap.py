"""FEM-in-SAP coupling tests (fem/sap_coupling.py).

The VERDICT round-2 item 6 acceptance bar: a deformable block on an incline
below the friction cone must hold STICTION through the SAP cone projection
— and the smooth-penalty path (fem/solver.py ground contact, whose
tangential term is viscous) must fail the same hold, demonstrating why the
reference routes deformables through SAP (deformable_driver.cc,
sap_fixed_constraint.h) instead of a penalty.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.fem import mesh as fem_mesh
from drake_tpu.fem import sap_coupling as fsc
from drake_tpu.fem.model import make_model
from drake_tpu.fem.solver import FemSolverOptions, FemState, implicit_step
from drake_tpu.geometry import shapes as sh
from drake_tpu.mpm.coupling import RigidGeom

F64 = jnp.float64


def _ground(z0=0.0):
    return RigidGeom(
        shape=sh.HalfSpace(), body_index=-1,
        R_WG=jnp.eye(3, dtype=F64),
        p_WG=jnp.asarray([0.0, 0.0, z0], F64),
        p_WB=jnp.zeros(3, F64), V_WB=jnp.zeros(6, F64),
    )


def _block(z_lift=0.0):
    verts, tets = fem_mesh.box_tet_mesh(3, 3, 2, size=(0.2, 0.2, 0.1))
    verts = np.asarray(verts)
    verts = verts + np.asarray([0.0, 0.0, z_lift - verts[:, 2].min()])
    model = make_model(
        verts, tets, density=1000.0, youngs_modulus=5e4, poisson_ratio=0.3,
        dtype=F64,
    )
    return model


class TestSapFemStep:
    def test_supported_at_rest(self):
        """The block settles on the ground: per-step normal impulse equals
        the weight impulse and vertices do not sink."""
        model = _block()
        state = FemState(x=model.rest_x, v=jnp.zeros_like(model.rest_x))
        h = 5e-3
        params = fsc.FemContactParams(
            stiffness=1e7, dissipation=0.1, friction=0.6
        )
        step = jax.jit(
            lambda s: fsc.sap_fem_step(model, s, h, (_ground(),), params)
        )
        res = None
        for _ in range(80):
            res = step(state)
            state = res.state
        m_tot = float(model.mass.sum())
        # Settled: tiny velocities, supported above the ground.
        assert float(jnp.abs(state.v).max()) < 0.02
        assert float(state.x[:, 2].min()) > -1e-3
        np.testing.assert_allclose(
            float(res.impulses[0, 5]), -m_tot * 9.81 * h, rtol=0.05
        )

    def test_stiction_on_incline_beats_penalty(self):
        """tan(theta) = 0.3 < mu = 0.6: SAP holds the block static; the
        penalty path (viscous tangential damping) creeps downhill."""
        g_tilt = (0.3 * 9.81, 0.0, -9.81)
        model = _block()
        x0 = model.rest_x
        com0 = jnp.mean(x0, axis=0)
        h = 5e-3
        n_steps = 150

        # SAP path.
        params = fsc.FemContactParams(
            stiffness=1e7, dissipation=0.05, friction=0.6
        )
        state = FemState(x=x0, v=jnp.zeros_like(x0))
        step = jax.jit(
            lambda s: fsc.sap_fem_step(
                model, s, h, (_ground(),), contact=params, gravity=g_tilt
            ).state
        )
        for _ in range(n_steps):
            state = step(state)
        assert bool(jnp.all(jnp.isfinite(state.x)))
        drift_sap = float(jnp.mean(state.x[:, 0]) - com0[0])
        assert abs(drift_sap) < 2e-3, drift_sap
        assert float(jnp.abs(state.v).max()) < 0.05

        # Penalty path at the same physical setup: creeps downhill.
        opts = FemSolverOptions(
            contact_stiffness=1e7, contact_friction_damping=1e2
        )
        state_p = FemState(x=x0, v=jnp.zeros_like(x0))
        pstep = jax.jit(
            lambda s: implicit_step(
                model, s, h, gravity=g_tilt, ground_z=0.0, options=opts
            )
        )
        for _ in range(n_steps):
            state_p = pstep(state_p)
        drift_pen = float(jnp.mean(np.nan_to_num(state_p.x[:, 0])) - com0[0])
        exploded = not bool(jnp.all(jnp.isfinite(state_p.x)))
        # The penalty either slides well past the SAP hold or blows up.
        assert exploded or abs(drift_pen) > 10 * max(abs(drift_sap), 1e-4), (
            drift_pen, drift_sap,
        )

    def test_gradients_flow_through_sap_contact(self):
        """The step differentiates (IFT custom_vjp through solve_sap):
        d(final height)/d(initial height) is finite and nonzero."""
        model = _block(z_lift=0.02)

        def final_z(lift):
            x = model.rest_x + jnp.asarray([0.0, 0.0, 1.0]) * lift
            s = FemState(x=x, v=jnp.zeros_like(x))
            for _ in range(3):
                s = fsc.sap_fem_step(model, s, 5e-3, (_ground(),)).state
            return jnp.mean(s.x[:, 2])

        g = jax.grad(final_z)(jnp.asarray(0.01, F64))
        assert bool(jnp.isfinite(g))
        assert abs(float(g)) > 1e-3


class TestPinnedVertexContact:
    def test_pinned_bubble_squeeze_impulses_finite(self):
        """Dirichlet-pinned vertices in (or near) contact must not poison
        the rigid impulses: their zero Jacobian rows used to yield w = 0
        regularization and NaN gammas (the bubble-gripper scenario —
        examples/multibody/deformable/bubble_gripper.cc role)."""
        pad = (0.02, 0.06, 0.06)
        overlap, half = 0.002, 0.02
        verts, tets = fem_mesh.box_tet_mesh(2, 3, 3, size=pad)
        verts = np.asarray(verts) - np.asarray(pad) / 2
        verts[:, 0] += -half - pad[0] / 2 + overlap
        pinned = verts[:, 0] < verts[:, 0].min() + 1e-6
        model = make_model(
            verts, tets, density=200.0, youngs_modulus=2e4,
            poisson_ratio=0.4, dirichlet_mask=pinned, dtype=F64,
        )
        from drake_tpu.geometry import shapes as sh

        geom = RigidGeom(
            shape=sh.Box((0.04, 0.04, 0.04)), body_index=0,
            R_WG=jnp.eye(3, dtype=F64), p_WG=jnp.zeros(3, F64),
            p_WB=jnp.zeros(3, F64), V_WB=jnp.zeros(6, F64),
        )
        contact = fsc.FemContactParams(
            stiffness=1e6, dissipation=0.1, friction=1.0
        )
        state = FemState(x=model.rest_x, v=jnp.zeros_like(model.rest_x))
        step = jax.jit(
            lambda s: fsc.sap_fem_step(model, s, 2e-3, (geom,), contact)
        )
        res = None
        for _ in range(20):
            res = step(state)
            state = res.state
        imp = np.asarray(res.impulses[0])
        assert np.all(np.isfinite(imp))
        assert np.all(np.isfinite(np.asarray(state.x)))
        # The squeezed pad pushes the box AWAY from itself (+x).
        assert imp[3] > 1e-4
