"""Witness-function / hybrid-event tests (reference
systems/framework/witness_function.h + examples/bouncing_ball)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.systems.base import ContinuousSystem
from drake_tpu.systems.simulator import WitnessFunction, simulate_hybrid

F64 = jnp.float64


def _ball(g=9.81):
    """x = [z, vz]; free fall."""

    def f(params, x, u, t):
        return jnp.stack([x[1], -g + 0.0 * x[0]])

    return ContinuousSystem(
        f=f, num_states=2, num_inputs=0, num_q=1, num_v=1, default_params=None
    )


def _bounce_witness(e=0.8):
    return WitnessFunction(
        g=lambda p, x, t: x[0],
        reset=lambda p, x, t: jnp.stack([jnp.maximum(x[0], 0.0), -e * x[1]]),
        direction="positive_then_negative",
    )


class TestBouncingBall:
    def test_bounce_time_and_energy(self):
        sys = _ball()
        x0 = jnp.asarray([1.0, 0.0], F64)
        e = 0.8
        run = jax.jit(
            lambda x: simulate_hybrid(
                sys, None, x, t_final=1.0, dt=0.01,
                witnesses=[_bounce_witness(e)],
            )
        )
        xs, ts, counts = run(x0)
        assert int(counts[0]) == 1  # one bounce within 1 s
        # Impact at t* = sqrt(2 h / g) = 0.4515 s with v = -4.429;
        # post-bounce the apex is e^2 * h = 0.64.
        z = np.asarray(xs[:, 0])
        t_imp = np.sqrt(2 * 1.0 / 9.81)
        k_imp = int(t_imp / 0.01)
        apex_after = z[k_imp + 2 :].max()
        np.testing.assert_allclose(apex_after, e**2 * 1.0, atol=5e-3)
        # Never meaningfully below ground (isolation works).
        assert z.min() > -1e-4

    def test_repeated_bounces_count(self):
        """Four bounces inside the pre-Zeno window (one event per macro
        step; past the Zeno accumulation a resting MODE, not a reset, would
        be needed — out of scope for witness isolation)."""
        sys = _ball()
        x0 = jnp.asarray([0.3, 0.0], F64)
        xs, ts, counts = simulate_hybrid(
            sys, None, x0, t_final=1.05, dt=0.005,
            witnesses=[_bounce_witness(0.7)],
        )
        # Bounce times (e=0.7): 0.247, 0.594, 0.836, 1.006 s.
        assert int(counts[0]) == 4
        assert np.asarray(xs[:, 0]).min() > -1e-3

    def test_no_event_matches_plain_integration(self):
        sys = _ball()
        x0 = jnp.asarray([100.0, 0.0], F64)  # never hits in 0.5 s
        xs, ts, counts = simulate_hybrid(
            sys, None, x0, t_final=0.5, dt=0.01,
            witnesses=[_bounce_witness()],
        )
        assert int(counts[0]) == 0
        np.testing.assert_allclose(
            float(xs[-1, 0]), 100.0 - 0.5 * 9.81 * 0.25, rtol=1e-9
        )

    def test_vmap_over_initial_heights(self):
        sys = _ball()
        heights = jnp.asarray([0.5, 1.0, 2.0], F64)
        xs0 = jnp.stack([heights, jnp.zeros(3, F64)], axis=1)
        batched = jax.jit(
            jax.vmap(
                lambda x: simulate_hybrid(
                    sys, None, x, t_final=1.5, dt=0.01,
                    witnesses=[_bounce_witness()],
                )[2]
            )
        )
        counts = batched(xs0)
        assert counts.shape == (3, 1)
        assert (np.asarray(counts) >= 1).all()

    def test_two_witnesses_earliest_wins(self):
        """A second witness (ceiling at z=0.5 while rising) must fire on the
        way up after the floor bounce, not before."""
        sys = _ball()
        floor = _bounce_witness(1.0)
        hits = WitnessFunction(
            g=lambda p, x, t: 0.5 - x[0],
            reset=lambda p, x, t: jnp.stack([x[0], -x[1]]),
            direction="positive_then_negative",
        )
        x0 = jnp.asarray([0.4, -2.0], F64)  # falling from below ceiling
        xs, ts, counts = simulate_hybrid(
            sys, None, x0, t_final=1.0, dt=0.005, witnesses=[floor, hits]
        )
        z = np.asarray(xs[:, 0])
        assert int(counts[0]) >= 1 and int(counts[1]) >= 1
        assert z.min() > -1e-4 and z.max() < 0.5 + 1e-3
