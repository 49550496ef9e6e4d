"""Configuration-space IRIS tests (planning/iris.py,
iris_in_configuration_space — the IrisInConfigurationSpace role,
geometry/optimization/iris.h; seeding per iris_from_clique_cover.h).

The VERDICT round-2 item 10 acceptance bar: an iiwa 7-dof C-space region
grown against the plant's own collision geometry, certified collision-free
by sampling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.collision_checker import check_configs
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.models import iiwa
from drake_tpu.multibody.model import REVOLUTE, ModelBuilder
from drake_tpu.planning.iris import (
    HPolyhedron,
    iris_from_clique_cover_seeds,
    iris_in_configuration_space,
)

F64 = jnp.float64


def _iiwa_world():
    """iiwa arm + a pole obstacle the elbow/wrist can hit."""
    b = ModelBuilder()
    for name, parent, rpy, xyz, mass, com, (ixx, iyy, izz), jt in iiwa._LINKS:
        b.add_body(
            name, parent=parent, joint_type=jt, mass=mass, com=com,
            inertia_com=np.diag([ixx, iyy, izz]), X_PJ_rpy=rpy, X_PJ_xyz=xyz,
            axis=(0, 0, 1), damping=0.0,
        )
    model, params = b.build(F64)
    geoms = [
        CollisionGeometry(
            name="pole", body=-1, shape=sh.Capsule(0.08, 1.2),
            p_BG=(0.55, 0.0, 0.6), friction=0.5,
        ),
        CollisionGeometry(
            name="ee", body=model.body_index("link7"),
            shape=sh.Sphere(0.08), friction=0.5,
        ),
        CollisionGeometry(
            name="wrist", body=model.body_index("link5"),
            shape=sh.Sphere(0.09), friction=0.5,
        ),
    ]
    scene = CollisionScene.build(geoms)
    return model, params, scene


def _domain(n=7, lim=1.5):
    return HPolyhedron.box([-lim] * n, [lim] * n)


class TestIrisInConfigurationSpace:
    def test_iiwa_region_certified_by_sampling(self):
        model, params, scene = _iiwa_world()
        q_seed = jnp.zeros(7, F64)  # upright: far from the pole
        region, E = iris_in_configuration_space(
            model, params, scene, q_seed, _domain(),
            num_iterations=4, samples_per_iteration=256,
            key=jax.random.PRNGKey(0),
        )
        # The region grew beyond the seed ball and kept the seed.
        assert bool(region.contains(q_seed))
        assert region.A.shape[0] > 14  # domain rows + real cuts
        # Certification: uniform samples INSIDE the region are free.
        key = jax.random.PRNGKey(7)
        n = 7
        u = jax.random.normal(key, (2000, n), F64)
        u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
        r = jax.random.uniform(
            jax.random.PRNGKey(8), (2000, 1), F64
        ) ** (1.0 / n)
        qs = E.d + (r * u) @ jnp.linalg.inv(E.C).T
        inside = np.asarray(
            jnp.all(qs @ region.A.T <= region.b[None, :] + 1e-12, axis=1)
        )
        qs_in = jnp.asarray(np.asarray(qs)[inside])
        assert qs_in.shape[0] > 200  # the ellipsoid mostly fits the region
        free = np.asarray(check_configs(model, params, scene, qs_in))
        frac = free.mean()
        assert frac >= 0.995, f"collision fraction {1 - frac:.4f}"

    def test_region_excludes_known_collision(self):
        """A configuration that reaches into the pole must be cut out."""
        model, params, scene = _iiwa_world()
        q_seed = jnp.zeros(7, F64)
        region, _ = iris_in_configuration_space(
            model, params, scene, q_seed, _domain(),
            num_iterations=4, samples_per_iteration=256,
            key=jax.random.PRNGKey(0),
        )
        # Lean the shoulder toward the pole until collision; every config
        # with meaningful penetration must be cut out (hairline boundary
        # penetrations within the sampled-cut margin may survive — the
        # quantitative certification lives in the sampling test above).
        from drake_tpu.geometry.collision_checker import min_distance

        q = jnp.zeros(7, F64)
        found = False
        for a1 in np.linspace(0.2, 1.5, 30):
            qq = q.at[1].set(a1)
            if float(min_distance(model, params, scene, qq)) < -0.02:
                found = True
                assert not bool(region.contains(qq)), a1
        assert found  # the sweep really hit the pole


class TestCliqueCoverSeeds:
    def test_seeds_are_free_and_spread(self):
        model, params, scene = _iiwa_world()
        seeds = iris_from_clique_cover_seeds(
            model, params, scene, _domain(), num_samples=64,
            num_seeds=2, visibility_samples=4, key=jax.random.PRNGKey(3),
        )
        assert len(seeds) >= 1
        from drake_tpu.geometry.collision_checker import check_config

        for s in seeds:
            assert bool(check_config(model, params, scene, jnp.asarray(s)))
