"""Region-of-attraction tests (analysis/region_of_attraction.py — the
reference systems/analysis/region_of_attraction.h role)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.analysis.region_of_attraction import region_of_attraction

F64 = jnp.float64


class TestRoa:
    def test_scalar_cubic_exact(self):
        # xdot = -x + x^3: the true ROA of 0 is |x| < 1.  With V = S x^2,
        # Vdot < 0 exactly on |x| < 1, so rho -> S * 1.
        f = lambda x: -x + x**3
        res = region_of_attraction(f, jnp.zeros(1, F64), t_max=3.0)
        S = float(res.S[0, 0])
        np.testing.assert_allclose(float(res.rho) / S, 1.0, rtol=0.03)

    def test_van_der_pol_reversed(self):
        # Time-reversed Van der Pol: the origin's ROA is the interior of
        # the (unstable) limit cycle — the reference's own demo system.
        def f(x):
            # reversed-time VdP (mu = 1)
            return -jnp.stack([x[1], -x[0] + (1.0 - x[0] ** 2) * x[1]])

        res = region_of_attraction(
            f, jnp.zeros(2, F64), num_directions=512, num_radii=512,
            t_max=4.0,
        )
        rho = float(res.rho)
        assert np.isfinite(rho) and rho > 0.1
        # Certified: sampled states inside {V <= rho} all converge to 0
        # under simulation.
        key = jax.random.PRNGKey(3)
        pts = jax.random.normal(key, (64, 2), F64)
        V = jax.vmap(lambda x: x @ res.S @ x)
        # rescale onto the level set boundary * 0.95
        pts = pts * jnp.sqrt(0.95 * rho / V(pts))[:, None]

        def simulate(x):
            def step(x, _):
                for _ in range(4):  # rk4-ish euler substeps
                    x = x + 5e-3 * f(x)
                return x, ()

            return jax.lax.scan(step, x, None, length=2500)[0]

        finals = jax.vmap(simulate)(pts)
        assert float(jnp.max(jnp.linalg.norm(finals, axis=1))) < 1e-2

    def test_limit_cycle_is_outside(self):
        # The certified level must not reach the limit cycle: the point
        # (2.01, 0) lies roughly on it and must be outside {V <= rho}.
        def f(x):
            return -jnp.stack([x[1], -x[0] + (1.0 - x[0] ** 2) * x[1]])

        res = region_of_attraction(
            f, jnp.zeros(2, F64), num_directions=512, num_radii=512,
            t_max=4.0,
        )
        on_cycle = jnp.asarray([2.01, 0.0], F64)
        assert float(on_cycle @ res.S @ on_cycle) > float(res.rho)
