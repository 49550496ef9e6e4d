"""systems/lcm-tier tests: pub/sub wired into jitted rollouts.

Mirrors the reference's systems/lcm/test/lcm_publisher_system_test.cc /
lcm_subscriber_system_test.cc roles on the memq:// transport: periodic
publishing from inside a compiled scan, latest-value subscription feeding a
compiled loop, and the hardware-in-the-loop round trip.
"""

import jax.numpy as jnp
import numpy as np

from drake_tpu.io.pubsub import PubSub, deserialize_arrays, serialize_arrays
from drake_tpu.systems import comms
from drake_tpu.systems.base import DiscreteSystem


def _double_integrator(h=0.1):
    def g(params, x, u, t):
        return jnp.array([x[0] + h * x[1], x[1] + h * u[0]])

    return DiscreteSystem(g=g, num_states=2, num_inputs=1, time_step=h)


class TestPublishingRollout:
    def test_publishes_in_order_with_decimation(self):
        bus = "memq://test_pub_rollout"
        node = PubSub(bus)
        listener = PubSub(bus)
        sub = listener.subscribe("STATE")

        dsys = _double_integrator()
        us = jnp.ones((10, 1))
        xs = comms.publishing_rollout(
            dsys, None, jnp.zeros(2), us, node, "STATE", publish_every=3
        )
        assert xs.shape == (11, 2)

        got = []
        while True:
            msg = listener.receive(sub)
            if msg is None:
                break
            got.append(deserialize_arrays(msg[1]))
        # steps 0,3,6,9 + final = 5 messages, in simulation order
        assert len(got) == 5
        ts = [float(m["t"]) for m in got]
        np.testing.assert_allclose(ts, [0.0, 0.3, 0.6, 0.9, 1.0], atol=1e-6)
        # published states match the returned rollout
        np.testing.assert_allclose(
            got[1]["x"], np.asarray(xs[3]), atol=1e-6)
        np.testing.assert_allclose(got[-1]["x"], np.asarray(xs[-1]),
                                   atol=1e-6)


class TestSubscriberInput:
    def test_latest_value_semantics(self):
        bus = "memq://test_sub_input"
        node = PubSub(bus)
        commander = PubSub(bus)

        sub = comms.SubscriberState(node, "CMD", shape=(1,), field="u")
        fetch = comms.subscriber_input(sub)

        # nothing published yet: count = 0
        _, count = fetch()
        assert int(count) == 0

        pub = comms.make_publisher(commander, "CMD", field="u")
        pub(np.asarray(0.0), np.array([2.5]))
        pub(np.asarray(0.1), np.array([3.5]))  # latest wins
        u, count = fetch()
        assert int(count) == 2
        np.testing.assert_allclose(np.asarray(u), [3.5])


class TestClosedLoopWithComms:
    def test_round_trip(self):
        bus = "memq://test_hil"
        node = PubSub(bus)
        remote = PubSub(bus)
        cmd_sub = comms.SubscriberState(node, "CMD", shape=(1,), field="u")

        # the "remote operator" pre-loads a command; the loop holds the
        # default (zero) until it lands, then tracks it
        remote.publish("CMD", serialize_arrays(u=np.array([1.0], np.float32)))

        dsys = _double_integrator()

        def policy(params, x, u_ext, t):
            return u_ext

        xs, us = comms.closed_loop_rollout_with_comms(
            dsys, None, jnp.zeros(2, jnp.float32), policy, 5, node, "STATE",
            command_sub=cmd_sub,
        )
        assert xs.shape == (6, 2)
        # the external command drove the plant
        np.testing.assert_allclose(np.asarray(us), np.ones((5, 1)), atol=1e-6)
        assert float(xs[-1, 1]) > 0.4
