"""BarycentricMesh (math/barycentric.h role): simplex interpolation with
input_size + 1 interpolants, exact on affine functions and at mesh points."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.math.barycentric import BarycentricMesh


def _mesh2():
    return BarycentricMesh([jnp.array([0.0, 1.0, 3.0]),
                            jnp.array([-1.0, 0.0, 1.0, 2.0])])


class TestBarycentricMesh:
    def test_structure(self):
        m = _mesh2()
        assert m.input_size == 2
        assert m.num_mesh_points == 12
        assert m.num_interpolants == 3
        pts = np.asarray(m.all_mesh_points())
        assert pts.shape == (12, 2)
        np.testing.assert_allclose(
            np.asarray(m.get_mesh_point(0)), pts[0]
        )
        np.testing.assert_allclose(
            np.asarray(m.get_mesh_point(11)), pts[11]
        )

    def test_weights_are_barycentric(self):
        m = _mesh2()
        for x in ([0.2, 0.3], [2.9, -0.9], [1.0, 1.0], [0.5, 1.999]):
            idx, w = m.eval_barycentric_weights(jnp.array(x))
            assert idx.shape == (3,) and w.shape == (3,)
            np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-12)
            assert float(jnp.min(w)) >= -1e-12
            # Convex combination reproduces the query point.
            pts = np.asarray(m.all_mesh_points())[np.asarray(idx)]
            np.testing.assert_allclose(
                (np.asarray(w)[:, None] * pts).sum(0), x, atol=1e-12
            )

    def test_exact_on_affine(self):
        m = _mesh2()
        fn = lambda x: 2.0 * x[0] - 3.0 * x[1] + 0.7
        vals = m.mesh_values_from(fn)
        for x in ([0.3, 0.9], [2.2, -0.4], [1.7, 1.3]):
            np.testing.assert_allclose(
                float(m.eval(vals, jnp.array(x))), fn(np.array(x)),
                atol=1e-12,
            )

    def test_exact_at_mesh_points_and_clips_outside(self):
        m = _mesh2()
        vals = jnp.arange(12.0)
        for i in (0, 5, 11):
            x = m.get_mesh_point(i)
            np.testing.assert_allclose(float(m.eval(vals, x)), float(i),
                                       atol=1e-12)
        inside = float(m.eval(vals, jnp.array([3.0, 2.0])))
        outside = float(m.eval(vals, jnp.array([99.0, 99.0])))
        np.testing.assert_allclose(inside, outside)

    def test_batched_eval_jits(self):
        m = _mesh2()
        vals = m.mesh_values_from(lambda x: jnp.sin(x[0]) * x[1])
        xs = jnp.array([[0.1, 0.1], [2.0, 1.5], [1.0, -0.5]])
        ys = jax.jit(jax.vmap(lambda x: m.eval(vals, x)))(xs)
        assert ys.shape == (3,)
