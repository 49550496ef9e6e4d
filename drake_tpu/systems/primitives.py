"""System primitives: LTI blocks, sources, holds, MLP.

Re-derivation of systems/primitives/ (reference: linear_system.h
LinearSystem/AffineSystem + Linearize(), trajectory_source.h, integrator.h,
zero_order_hold.h, multilayer_perceptron.h, random_source.h,
vector_log_sink.h — the logger lives in drake_tpu.analysis.stats).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from drake_tpu.systems.base import ContinuousSystem, DiscreteSystem
from drake_tpu.utils.struct import pytree_dataclass


def linear_system(A, B, C=None, D=None) -> ContinuousSystem:
    """xdot = Ax + Bu, y = Cx + Du (LinearSystem)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    n, m = B.shape
    C_ = jnp.eye(n, dtype=A.dtype) if C is None else jnp.asarray(C)
    D_ = jnp.zeros((C_.shape[0], m), A.dtype) if D is None else jnp.asarray(D)

    def f(params, x, u, t=0.0):
        return A @ x + B @ u

    def output(params, x, u, t=0.0):
        return C_ @ x + D_ @ u

    return ContinuousSystem(f=f, num_states=n, num_inputs=m, output=output)


def affine_system(A, B, f0, C=None, D=None, y0=None) -> ContinuousSystem:
    """xdot = Ax + Bu + f0 (AffineSystem)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    f0 = jnp.asarray(f0)
    n, m = B.shape
    C_ = jnp.eye(n, dtype=A.dtype) if C is None else jnp.asarray(C)
    D_ = jnp.zeros((C_.shape[0], m), A.dtype) if D is None else jnp.asarray(D)
    y0_ = jnp.zeros(C_.shape[0], A.dtype) if y0 is None else jnp.asarray(y0)

    def f(params, x, u, t=0.0):
        return A @ x + B @ u + f0

    def output(params, x, u, t=0.0):
        return C_ @ x + D_ @ u + y0_

    return ContinuousSystem(f=f, num_states=n, num_inputs=m, output=output)


def discrete_linear_system(A, B, time_step: float) -> DiscreteSystem:
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    n, m = B.shape

    def g(params, x, u, t=0.0):
        return A @ x + B @ u

    return DiscreteSystem(g=g, num_states=n, num_inputs=m, time_step=time_step)


def linearize(system: ContinuousSystem, params, x0, u0, t0=0.0):
    """(A, B) Jacobian linearization — drake::systems::Linearize role."""
    return system.linearize(params, x0, u0, t0)


def trajectory_source(traj) -> Callable:
    """Policy-style source: u(t) = traj.value(t) (TrajectorySource role)."""

    def source(_, x, t):
        return traj.value(t)

    return source


def zero_order_hold(values, period: float):
    """ZOH lookup u(t) = values[floor(t/period)] (ZeroOrderHold role)."""
    values = jnp.asarray(values)
    n = values.shape[0]

    def hold(t):
        idx = jnp.clip((t / period).astype(jnp.int32), 0, n - 1)
        return values[idx]

    return hold


# ---------------------------------------------------------------------------
# MultilayerPerceptron (multilayer_perceptron.h role) — value-function and
# policy approximation for DynamicProgramming-style workflows.
# ---------------------------------------------------------------------------


@pytree_dataclass
class MlpParams:
    weights: tuple
    biases: tuple


def mlp_init(
    key, layer_sizes: Sequence[int], dtype=jnp.float32
) -> MlpParams:
    ws, bs = [], []
    for i in range(len(layer_sizes) - 1):
        key, sub = jax.random.split(key)
        fan_in = layer_sizes[i]
        w = jax.random.normal(sub, (layer_sizes[i], layer_sizes[i + 1]), dtype)
        ws.append(w / jnp.sqrt(fan_in))
        bs.append(jnp.zeros(layer_sizes[i + 1], dtype))
    return MlpParams(weights=tuple(ws), biases=tuple(bs))


def mlp_apply(params: MlpParams, x, activation=jax.nn.tanh):
    h = x
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ w + b
        if i < n - 1:
            h = activation(h)
    return h


def random_source(key, shape, distribution: str = "gaussian"):
    """RandomSource role: a sampled signal array."""
    if distribution == "gaussian":
        return jax.random.normal(key, shape)
    if distribution == "uniform":
        return jax.random.uniform(key, shape)
    raise ValueError(distribution)


def symbolic_vector_system(
    state: Sequence,  # symbolic Variables for x
    dynamics: Sequence,  # Expressions: xdot (or x_next if time_period>0)
    inputs: Sequence = (),  # symbolic Variables for u
    output: Optional[Sequence] = None,  # Expressions; default: full state
    time: Optional[object] = None,  # symbolic Variable for t, if used
    time_period: float = 0.0,
):
    """SymbolicVectorSystem (systems/primitives/symbolic_vector_system.h):
    build a ContinuousSystem/DiscreteSystem from symbolic dynamics.

    The expressions are compiled once via symbolic.to_jax (the codegen.h
    role — XLA is the code generator), so the resulting system jits, vmaps,
    and differentiates like any hand-written one.
    """
    from drake_tpu.math import symbolic as sym

    state = list(state)
    inputs = list(inputs)
    allvars = state + inputs + ([time] if time is not None else [])
    f_dyn = sym.to_jax(list(dynamics), allvars)
    f_out = sym.to_jax(list(output), allvars) if output is not None else None

    def pack(x, u, t):
        parts = [jnp.atleast_1d(x), jnp.atleast_1d(jnp.asarray(u, x.dtype))]
        if time is not None:
            parts.append(jnp.asarray(t, x.dtype)[None])
        return jnp.concatenate(parts)

    def f(params, x, u, t=0.0):
        return f_dyn(pack(x, u, t))

    out_fn = (lambda params, x, u, t=0.0: f_out(pack(x, u, t))) if f_out else None

    if time_period > 0.0:
        return DiscreteSystem(
            g=f, num_states=len(state), num_inputs=len(inputs),
            time_step=time_period, output=out_fn,
        )
    return ContinuousSystem(
        f=f, num_states=len(state), num_inputs=len(inputs), output=out_fn
    )


# ---------------------------------------------------------------------------
# Wiring blocks (systems/primitives/ utility systems).  The reference makes
# each a LeafSystem wired in a DiagramBuilder; in a functional framework the
# stateless ones are pure callables (compose them inside a policy or output
# map) and the stateful ones are DiscreteSystems.  References: adder.h,
# gain.h, saturation.h, pass_through.h, multiplexer.h, demultiplexer.h,
# constant_vector_source.h, sine.h, wrap_to_system.h, port_switch.h,
# discrete_derivative.h.
# ---------------------------------------------------------------------------


def constant_vector_source(value) -> Callable:
    """u(t) = value (ConstantVectorSource role)."""
    value = jnp.asarray(value)
    return lambda t=0.0: value


def sine_source(amplitude, frequency, phase=0.0) -> Callable:
    """y(t) = amplitude * sin(2*pi*frequency*t + phase) (Sine role;
    sine.h parameterizes by angular frequency — pass frequency in Hz)."""
    amplitude = jnp.asarray(amplitude)

    def source(t):
        return amplitude * jnp.sin(2.0 * jnp.pi * frequency * t + phase)

    return source


def adder(*signals):
    """Elementwise sum (Adder role)."""
    total = jnp.asarray(signals[0])
    for s in signals[1:]:
        total = total + jnp.asarray(s)
    return total


def gain(k, u):
    """y = k * u, scalar or per-channel k (Gain role)."""
    return jnp.asarray(k) * jnp.asarray(u)


def saturation(u, u_min, u_max):
    """y = clip(u, u_min, u_max) (Saturation role)."""
    return jnp.clip(jnp.asarray(u), u_min, u_max)


def pass_through(u):
    """Identity (PassThrough role — feedthrough stub while wiring)."""
    return jnp.asarray(u)


def multiplexer(*inputs):
    """Concatenate input vectors into one (Multiplexer role)."""
    return jnp.concatenate([jnp.atleast_1d(jnp.asarray(u)) for u in inputs])


def demultiplexer(u, sizes: Sequence[int]):
    """Split u into vectors of the given sizes (Demultiplexer role)."""
    u = jnp.asarray(u)
    out, start = [], 0
    for s in sizes:
        out.append(u[start:start + s])
        start += s
    return tuple(out)


def port_switch(index, *inputs):
    """Select inputs[index] with a traced index (PortSwitch role)."""
    return jnp.stack([jnp.asarray(u) for u in inputs])[index]


def wrap_to_system(u, low, high, indices: Optional[Sequence[int]] = None):
    """Wrap selected channels into [low, high) (WrapToSystem role,
    math::wrap_to applied per channel)."""
    u = jnp.asarray(u)
    wrapped = low + jnp.mod(u - low, high - low)
    if indices is None:
        return wrapped
    mask = jnp.zeros(u.shape[-1], bool).at[jnp.asarray(indices)].set(True)
    return jnp.where(mask, wrapped, u)


def first_order_hold(times, values):
    """FOH lookup u(t): linear interpolation through (times, values)
    (the trajectory-free counterpart of zero_order_hold above)."""
    times = jnp.asarray(times)
    values = jnp.asarray(values)

    def hold(t):
        return jax.vmap(
            lambda col: jnp.interp(t, times, col), in_axes=-1, out_axes=-1
        )(values)

    return hold


def discrete_derivative(size: int, period: float,
                        suppress_initial_transient: bool = True):
    """DiscreteDerivative (discrete_derivative.h): y = (x0 - x1) / h.

    Reference timing: the output is computed from STORED STATE only
    (x0 = u[n-1], x1 = u[n-2] after n updates), never from the live
    input — no direct feedthrough, so the estimate lags the input by one
    sample period exactly as the reference block does.  State =
    (x0, x1, sample counter when the initial transient is suppressed —
    the reference flag zeroes y until two samples are stored).
    """
    n_extra = 1 if suppress_initial_transient else 0

    def g(params, x, u, t=0.0):
        new0 = jnp.asarray(u)
        new1 = x[:size]
        if suppress_initial_transient:
            count = x[2 * size] + 1.0
            return jnp.concatenate(
                [new0, new1, jnp.array([count], x.dtype)]
            )
        return jnp.concatenate([new0, new1])

    def output(params, x, u, t=0.0):
        deriv = (x[:size] - x[size : 2 * size]) / period
        if suppress_initial_transient:
            return jnp.where(
                x[2 * size] >= 2.0, deriv, jnp.zeros_like(deriv)
            )
        return deriv

    return DiscreteSystem(
        g=g, num_states=2 * size + n_extra, num_inputs=size,
        time_step=period, output=output,
    )


def state_interpolator_with_discrete_derivative(
    size: int, period: float, suppress_initial_transient: bool = True
):
    """StateInterpolatorWithDiscreteDerivative (discrete_derivative.h:161):
    position commands in -> [q; v] desired state out, v by backward
    difference.  The standard glue between a position source and a
    controller that wants full desired state."""
    dd = discrete_derivative(size, period, suppress_initial_transient)

    def output(params, x, u, t=0.0):
        v = dd.output(params, x, u, t)
        return jnp.concatenate([jnp.asarray(u), v])

    return DiscreteSystem(
        g=dd.g, num_states=dd.num_states, num_inputs=size,
        time_step=period, output=output,
    )
