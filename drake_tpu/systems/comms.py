"""Pub/sub comms wired INTO jitted simulation loops (the systems/lcm tier).

The reference wires LCM into simulation as systems: LcmPublisherSystem
publishes an input port on a periodic event, LcmSubscriberSystem stores the
latest decoded message as state, and LcmInterfaceSystem pumps the handler
inside Simulator::AdvanceTo (reference: systems/lcm/lcm_publisher_system.h,
lcm_subscriber_system.h, lcm_interface_system.h).

Under JAX, the simulation loop is a single `lax.scan` compiled onto the
device, so host comms cannot be a Python call inside the loop body.  The
TPU-native equivalent is `jax.experimental.io_callback`: an *ordered* host
callback embedded in the traced program.  XLA runs the rollout on-device and
surfaces to the host only at publish/poll points — one compiled program, real
transport traffic, deterministic ordering.

Design notes (vs a naive translation):
  - Publishing is decimated on-device (`lax.cond` on ``k % publish_every``)
    so the host is touched only when a message is actually due.
  - The subscriber feeds the loop through a fixed-shape "latest message +
    valid flag" contract (like LcmSubscriberSystem's latest-value state):
    dynamic message sizes would break XLA static shapes, so the decoded
    payload shape is declared up front.
  - These helpers are for SINGLE rollouts (hardware-in-the-loop, teleop,
    visualization).  Batched scenario sweeps should log on-device (VectorLog)
    and publish after the fact — host IO per lane would serialize the batch.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from drake_tpu.io.pubsub import PubSub, deserialize_arrays, serialize_arrays


def make_publisher(
    node: PubSub, channel: str, field: str = "x"
) -> Callable[[jnp.ndarray, jnp.ndarray], None]:
    """Host-side publish function suitable for io_callback.

    Returns ``publish(t, x)`` which serializes {t, field: x} onto ``channel``
    using the self-describing array format (the Serializer role).
    """

    def publish(t, x):
        node.publish(
            channel, serialize_arrays(t=np.asarray(t), **{field: np.asarray(x)})
        )
        return np.zeros((), np.int32)

    return publish


def publishing_rollout(
    dsys,
    params: Any,
    x0: jnp.ndarray,
    us: jnp.ndarray,
    node: PubSub,
    channel: str,
    publish_every: int = 1,
    field: str = "x",
):
    """Discrete rollout that publishes the state every k-th step.

    LcmPublisherSystem-in-a-Diagram analog: `xs = rollout(...)` compiles to
    one scan; each due step surfaces to the host, serializes the state, and
    publishes it on ``channel`` before the next step runs (ordered
    io_callback — messages arrive in simulation order).

    Returns xs: (num_steps + 1, nx).
    """
    publish = make_publisher(node, channel, field)
    h = dsys.time_step

    def step(carry, inp):
        x, k = carry
        u = inp
        t = k.astype(x.dtype) * h

        def do_pub(x):
            io_callback(publish, jax.ShapeDtypeStruct((), jnp.int32), t, x,
                        ordered=True)
            return x

        x = jax.lax.cond(k % publish_every == 0, do_pub, lambda x: x, x)
        x_next = dsys.g(params, x, u, t)
        return (x_next, k + 1), x_next

    (xf, _), xs_tail = jax.lax.scan(step, (x0, jnp.asarray(0)), us)
    # final publish so the trailing state is visible to subscribers
    io_callback(
        publish, jax.ShapeDtypeStruct((), jnp.int32),
        jnp.asarray(us.shape[0], xf.dtype) * h, xf, ordered=True,
    )
    return jnp.concatenate([x0[None], xs_tail], axis=0)


class SubscriberState:
    """Host-side latest-value store for a channel (LcmSubscriberSystem state).

    Polls the transport on demand and exposes a fixed-shape snapshot:
    ``(payload, count)`` where count is the number of messages received so
    far (0 = nothing yet; callers treat payload as garbage until count > 0).
    """

    def __init__(self, node: PubSub, channel: str, shape, dtype=np.float32,
                 field: str = "u"):
        self.node = node
        self.sub_id = node.subscribe(channel)
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.field = field
        self._latest = np.zeros(self.shape, self.dtype)
        self._count = 0

    def poll(self):
        self.node.handle(0)
        while True:
            msg = self.node.receive(self.sub_id)
            if msg is None:
                break
            arrays = deserialize_arrays(msg[1])
            if self.field in arrays:
                payload = np.asarray(arrays[self.field], self.dtype)
                if payload.shape == self.shape:
                    self._latest = payload
                    self._count += 1
        return self._latest, np.asarray(self._count, np.int32)


def subscriber_input(sub: SubscriberState):
    """Traceable fetch of the latest message: ``(payload, count) = fetch()``.

    Embeds an ordered io_callback so a jitted controller/sim loop reads real
    transport traffic each time it is executed.
    """

    def fetch():
        return io_callback(
            sub.poll,
            (
                jax.ShapeDtypeStruct(sub.shape, sub.dtype),
                jax.ShapeDtypeStruct((), jnp.int32),
            ),
            ordered=True,
        )

    return fetch


def closed_loop_rollout_with_comms(
    dsys,
    params: Any,
    x0: jnp.ndarray,
    policy: Callable,  # (params, x, u_ext, t) -> u
    num_steps: int,
    node: PubSub,
    state_channel: str,
    command_sub: Optional[SubscriberState] = None,
    publish_every: int = 1,
    u_default: Optional[jnp.ndarray] = None,
):
    """Hardware-in-the-loop shaped rollout: publish state, read commands.

    The LcmInterfaceSystem + publisher + subscriber diagram in one scan:
    each step publishes the state on ``state_channel``, polls the latest
    external command (held at ``u_default`` until the first message, like
    LcmSubscriberSystem's initial value), and advances the plant with
    ``policy(params, x, u_ext, t)``.
    """
    publish = make_publisher(node, state_channel, "x")
    h = dsys.time_step
    if u_default is None:
        u_default = jnp.zeros((dsys.num_inputs,), x0.dtype)
    fetch = subscriber_input(command_sub) if command_sub is not None else None

    def step(carry, k):
        x = carry
        t = k.astype(x.dtype) * h

        def do_pub(x):
            io_callback(publish, jax.ShapeDtypeStruct((), jnp.int32), t, x,
                        ordered=True)
            return x

        x = jax.lax.cond(k % publish_every == 0, do_pub, lambda x: x, x)
        if fetch is not None:
            u_ext, count = fetch()
            u_ext = jnp.where(count > 0, u_ext.astype(x.dtype), u_default)
        else:
            u_ext = u_default
        u = policy(params, x, u_ext, t)
        x_next = dsys.g(params, x, u, t)
        return x_next, (x_next, u)

    xf, (xs_tail, us) = jax.lax.scan(step, x0, jnp.arange(num_steps))
    return jnp.concatenate([x0[None], xs_tail], axis=0), us
