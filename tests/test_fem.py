"""FEM deformable tests.

Mirrors the reference's FEM validation style (reference multibody/fem/test/
fem_solver_test.cc, corotated_model_test.cc): energy/force consistency,
static equilibrium under Dirichlet constraints, a deformable-torus drop
test (the reference's examples/multibody/deformable/deformable_torus.cc
scenario, qualitatively), and gradient checks through the implicit step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_tpu.fem import mesh as fem_mesh
from drake_tpu.fem.model import (
    FemModel,
    deformation_gradients,
    elastic_energy,
    elastic_forces,
    make_model,
)
from drake_tpu.fem.solver import (
    FemSolverOptions,
    FemState,
    implicit_step,
    make_state,
)


def _box_model(nx=2, ny=2, nz=2, **kw):
    verts, tets = fem_mesh.box_tet_mesh(nx, ny, nz, size=(0.2, 0.2, 0.2))
    kw.setdefault("dtype", jnp.float64)
    return make_model(verts, tets, **kw)


class TestMesh:
    def test_box_mesh_volume(self):
        verts, tets = fem_mesh.box_tet_mesh(3, 2, 4, size=(0.3, 0.2, 0.4))
        vols = fem_mesh.signed_volumes(verts, fem_mesh.fix_orientation(verts, tets))
        assert (vols > 0).all()
        np.testing.assert_allclose(vols.sum(), 0.3 * 0.2 * 0.4, rtol=1e-12)

    def test_torus_mesh_conforming(self):
        verts, tets = fem_mesh.torus_tet_mesh(
            major_radius=0.3, minor_half=0.08, segments=12, n_cross=2
        )
        tets = fem_mesh.fix_orientation(verts, tets)
        vols = fem_mesh.signed_volumes(verts, tets)
        assert (vols > 0).all()
        # Swept square cross-section: volume -> 2*pi*R*(2a)^2 as segments
        # grow; at 12 segments the chordal sweep underestimates slightly.
        exact = 2 * np.pi * 0.3 * (2 * 0.08) ** 2
        assert 0.9 * exact < vols.sum() < 1.01 * exact
        # Every interior face must be shared by exactly 2 tets (conforming,
        # watertight): boundary faces shared by exactly 1.
        faces = {}
        for t in tets:
            for f in ([0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]):
                key = tuple(sorted(t[f]))
                faces[key] = faces.get(key, 0) + 1
        assert set(faces.values()) <= {1, 2}


class TestModel:
    def test_rest_state_zero_energy_and_force(self):
        model = _box_model()
        e = elastic_energy(model, model.rest_x)
        assert float(e) < 1e-12
        f = elastic_forces(model, model.rest_x)
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-9)

    def test_deformation_gradient_identity_at_rest(self):
        model = _box_model()
        F = deformation_gradients(model, model.rest_x)
        np.testing.assert_allclose(
            np.asarray(F), np.broadcast_to(np.eye(3), F.shape), atol=1e-12
        )

    def test_rigid_motion_invariance(self):
        """Energy is invariant to rotation + translation (corotated)."""
        model = _box_model()
        th = 0.7
        R = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        )
        x = model.rest_x @ R.T + jnp.asarray([0.3, -0.1, 0.5])
        assert float(elastic_energy(model, x)) < 1e-10

    def test_uniform_stretch_energy_analytic(self):
        """F = diag(s,1,1): Psi = mu*(s-1)^2 + lam/2*(s-1)^2 per unit vol."""
        model = _box_model(youngs_modulus=2e4, poisson_ratio=0.3)
        s = 1.05
        x = model.rest_x * jnp.asarray([s, 1.0, 1.0])
        vol = float(jnp.sum(model.volume))
        expected = vol * (
            float(model.mu) * (s - 1) ** 2
            + 0.5 * float(model.lam) * (s - 1) ** 2
        )
        np.testing.assert_allclose(
            float(elastic_energy(model, x)), expected, rtol=1e-9
        )

    def test_forces_match_fd_energy(self):
        model = _box_model(nx=1, ny=1, nz=1)
        rng = np.random.default_rng(0)
        x = np.asarray(model.rest_x) + 0.01 * rng.standard_normal(
            model.rest_x.shape
        )
        x = jnp.asarray(x)
        f = np.asarray(elastic_forces(model, x))
        eps = 1e-6
        for idx in [(0, 0), (3, 1), (7, 2)]:
            dx = np.zeros(x.shape)
            dx[idx] = eps
            ep = float(elastic_energy(model, x + dx))
            em = float(elastic_energy(model, x - dx))
            fd = -(ep - em) / (2 * eps)
            np.testing.assert_allclose(f[idx], fd, rtol=1e-5, atol=1e-8)

    def test_lumped_mass_total(self):
        model = _box_model(density=1200.0)
        np.testing.assert_allclose(
            float(jnp.sum(model.mass)), 1200.0 * 0.2**3, rtol=1e-12
        )


class TestImplicitStep:
    def test_free_fall_matches_gravity(self):
        """No contact, no pin: the body free-falls exactly (no spurious
        internal forces at rest shape)."""
        model = _box_model()
        state = make_state(model)
        h = 0.01
        step = jax.jit(
            lambda s: implicit_step(model, s, h=h, ground_z=None)
        )
        for _ in range(5):
            state = step(state)
        t = 5 * h
        # COM obeys z = -g t^2 / 2, v = -g t.
        com_z = float(jnp.sum(model.mass * state.x[:, 2]) / jnp.sum(model.mass))
        rest_com_z = float(
            jnp.sum(model.mass * model.rest_x[:, 2]) / jnp.sum(model.mass)
        )
        # Backward Euler free fall: v_{k+1} = v_k - g h (exact), x via v_{k+1}
        # => x drop = -g h^2 (1+2+..+n) = -g h^2 n(n+1)/2.
        expected_drop = -9.81 * h * h * (5 * 6) / 2
        np.testing.assert_allclose(
            com_z - rest_com_z, expected_drop, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(state.v[:, 2].mean()), -9.81 * t, rtol=1e-6
        )

    def test_pinned_top_sags_to_equilibrium(self):
        """A soft box pinned at its top face sags and settles: residual
        forces at the converged state balance gravity."""
        verts, tets = fem_mesh.box_tet_mesh(2, 2, 2, size=(0.2, 0.2, 0.2))
        pin = verts[:, 2] > 0.2 - 1e-9
        model = make_model(
            verts,
            tets,
            youngs_modulus=5e4,
            poisson_ratio=0.3,
            dirichlet_mask=pin,
            dtype=jnp.float64,
        )
        state = make_state(model)
        h = 5e-3

        @jax.jit
        def roll(s):
            return jax.lax.scan(
                lambda c, _: (implicit_step(model, c, h=h), None),
                s, None, length=200,
            )[0]

        state = roll(state)
        # Settled: velocities ~ 0, and free nodes moved down.
        assert float(jnp.max(jnp.abs(state.v))) < 1e-3
        free = np.asarray(model.dirichlet) > 0
        sag = np.asarray(model.rest_x[:, 2] - state.x[:, 2])[free]
        assert sag.min() > 0  # every free node sagged
        # Force balance at equilibrium: internal + gravity ~ 0 on free nodes.
        f_int = np.asarray(elastic_forces(model, state.x))
        f_grav = np.asarray(model.mass)[:, None] * np.array([0, 0, -9.81])
        resid = (f_int + f_grav)[free]
        scale = np.abs(f_grav).max()
        assert np.abs(resid).max() < 0.05 * scale

    def test_torus_drop_settles_on_ground(self):
        """The reference deformable-torus scenario: drop a soft torus on the
        ground; it deforms, does not pass through, and comes to rest
        (reference examples/multibody/deformable/deformable_torus.cc)."""
        verts, tets = fem_mesh.torus_tet_mesh(
            major_radius=0.1, minor_half=0.03, segments=12, n_cross=2
        )
        verts = verts + np.array([0, 0, 0.08])  # bottom at z=0.05
        model = make_model(
            verts, tets, youngs_modulus=2e4, poisson_ratio=0.4,
            density=800.0, dtype=jnp.float64,
        )
        state = make_state(model)
        h = 2e-3
        opts = FemSolverOptions(newton_iters=6, cg_iters=20)

        @jax.jit
        def roll(s):
            return jax.lax.scan(
                lambda c, _: (
                    implicit_step(model, c, h=h, ground_z=0.0, options=opts),
                    None,
                ),
                s, None, length=300,
            )[0]

        state = roll(state)
        z = np.asarray(state.x[:, 2])
        # Rests on the ground: bottom within a penetration tolerance,
        # nothing fell through, and the body is quiescent.
        assert z.min() > -0.01
        assert z.min() < 0.01  # actually touching, not hovering
        assert float(jnp.max(jnp.abs(state.v))) < 0.05
        # Deformed but not collapsed: the torus still has its height scale.
        assert 0.03 < z.max() < 0.12

    def test_large_step_stable(self):
        """Stability at h far beyond explicit limits (implicit integration):
        explicit dt_crit ~ dx/c ~ 0.07/sqrt(1e5/1000) ~ 7e-3; use h=50ms."""
        model = _box_model(youngs_modulus=1e5)
        state = make_state(model)

        @jax.jit
        def roll(s):
            return jax.lax.scan(
                lambda c, _: (
                    implicit_step(model, c, h=0.05, ground_z=-0.05),
                    None,
                ),
                s, None, length=40,
            )[0]

        state = roll(state)
        assert np.isfinite(np.asarray(state.x)).all()
        assert float(jnp.max(jnp.abs(state.v))) < 1.0

    def test_vmap_batch(self):
        """Batched deformables (the TPU point of the design)."""
        model = _box_model(dtype=jnp.float32)
        state = make_state(model)
        k = 4
        xs = jnp.stack([state.x] * k) + 1e-3 * jax.random.normal(
            jax.random.PRNGKey(0), (k,) + state.x.shape, jnp.float32
        )
        vs = jnp.zeros_like(xs)
        batched = jax.jit(
            jax.vmap(
                lambda x, v: implicit_step(
                    model, FemState(x, v), h=0.01, ground_z=-0.2
                )
            )
        )
        out = batched(xs, vs)
        assert out.x.shape == (k,) + state.x.shape
        assert np.isfinite(np.asarray(out.x)).all()

    def test_gradient_through_step(self):
        """jax.grad through the implicit step (unrolled Newton) is exact:
        check against central finite differences of a rollout loss."""
        model = _box_model(nx=1, ny=1, nz=1, youngs_modulus=2e4)
        state = make_state(model)

        @jax.jit
        def loss(v0_z):
            v = state.v.at[:, 2].set(v0_z)
            s = FemState(state.x, v)
            opts = FemSolverOptions(newton_iters=3, cg_iters=10)
            s = jax.lax.scan(
                lambda c, _: (
                    implicit_step(model, c, h=0.01, options=opts), None
                ),
                s, None, length=2,
            )[0]
            return jnp.sum(s.x[:, 2] ** 2)

        g = float(jax.grad(loss)(0.3))
        eps = 1e-5
        fd = (float(loss(0.3 + eps)) - float(loss(0.3 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)
