"""Wiring-block primitives (systems/primitives/ utility systems):
adder/gain/saturation/mux/demux/port_switch/wrap_to/sources and the
stateful DiscreteDerivative + StateInterpolatorWithDiscreteDerivative
(discrete_derivative.h)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.systems import primitives as prim


class TestStatelessBlocks:
    def test_adder_gain_saturation_passthrough(self):
        a = jnp.array([1.0, -2.0])
        b = jnp.array([0.5, 0.5])
        np.testing.assert_allclose(prim.adder(a, b, b), [2.0, -1.0])
        np.testing.assert_allclose(prim.gain(2.0, a), [2.0, -4.0])
        np.testing.assert_allclose(
            prim.saturation(a, -1.0, 1.0), [1.0, -1.0]
        )
        np.testing.assert_allclose(prim.pass_through(a), a)

    def test_mux_demux_round_trip(self):
        u = prim.multiplexer(jnp.array([1.0, 2.0]), 3.0, jnp.array([4.0]))
        np.testing.assert_allclose(u, [1, 2, 3, 4])
        parts = prim.demultiplexer(u, [2, 1, 1])
        assert len(parts) == 3
        np.testing.assert_allclose(parts[0], [1, 2])
        np.testing.assert_allclose(parts[2], [4])

    def test_port_switch_traced(self):
        sel = jax.jit(
            lambda i: prim.port_switch(
                i, jnp.array([1.0, 1.0]), jnp.array([2.0, 2.0])
            )
        )
        np.testing.assert_allclose(sel(0), [1.0, 1.0])
        np.testing.assert_allclose(sel(1), [2.0, 2.0])

    def test_wrap_to_selected_channels(self):
        u = jnp.array([3.5 * jnp.pi, 0.25])
        y = prim.wrap_to_system(u, -jnp.pi, jnp.pi, indices=[0])
        np.testing.assert_allclose(float(y[0]), -0.5 * np.pi, rtol=1e-6)
        np.testing.assert_allclose(float(y[1]), 0.25)

    def test_sources(self):
        c = prim.constant_vector_source([1.0, 2.0])
        np.testing.assert_allclose(c(5.0), [1.0, 2.0])
        s = prim.sine_source(2.0, 0.5)  # period 2 s
        np.testing.assert_allclose(float(s(0.5)), 2.0, atol=1e-6)
        foh = prim.first_order_hold(
            jnp.array([0.0, 1.0]), jnp.array([[0.0, 0.0], [2.0, 4.0]])
        )
        np.testing.assert_allclose(foh(0.5), [1.0, 2.0])


class TestDiscreteDerivative:
    def test_backward_difference_with_transient_suppressed(self):
        h = 0.1
        sys = prim.discrete_derivative(2, h)
        x = jnp.zeros(sys.num_states)
        us = jnp.array(
            [[0.0, 0.0], [0.1, -0.2], [0.3, -0.1], [0.3, -0.1]]
        )
        outs = []
        for u in us:
            outs.append(np.asarray(sys.output(None, x, u)))
            x = sys.g(None, x, u)
        # Reference timing (discrete_derivative.h): NO direct feedthrough —
        # y[k] = (u[k-1] - u[k-2])/h from stored state only, first two
        # samples suppressed.
        np.testing.assert_allclose(outs[0], 0.0)
        np.testing.assert_allclose(outs[1], 0.0)
        np.testing.assert_allclose(outs[2], [1.0, -2.0], rtol=1e-6)
        np.testing.assert_allclose(outs[3], [2.0, 1.0], rtol=1e-6)

    def test_state_interpolator_shapes_desired_state(self):
        h = 0.05
        sys = prim.state_interpolator_with_discrete_derivative(
            3, h, suppress_initial_transient=False
        )
        x = jnp.zeros(sys.num_states)
        u0 = jnp.array([0.1, 0.2, 0.3])
        u1 = u0 + h * jnp.array([1.0, -1.0, 0.5])
        # Reference timing: v comes from the two STORED samples, so both
        # updates must have happened before the derivative appears.
        x = sys.g(None, x, u0)
        x = sys.g(None, x, u1)
        y = np.asarray(sys.output(None, x, u1))
        np.testing.assert_allclose(y[:3], np.asarray(u1))
        np.testing.assert_allclose(y[3:], [1.0, -1.0, 0.5], rtol=1e-6)
