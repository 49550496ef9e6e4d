"""Gym-style RL environment over drake_tpu systems (the pydrake.gym role).

The reference wraps a Simulator as a Gymnasium env
(bindings/pydrake/gym/_drake_gym_env.py: DrakeGymEnv — reset/step/reward
over a diagram, one env per process, stable_baselines-ready).  The
TPU-native version is FUNCTIONAL: the environment is a pure step function
over an explicit state, so `jax.vmap` gives thousands of parallel
environments in one compiled program and `lax.scan` gives whole-episode
rollouts on device — the shape RL training on accelerators wants
(any jax RL stack: the env is just pytrees + pure functions).

Two surfaces:
  - DrakeGymEnv: stateful, gymnasium-compatible step/reset for host loops
    and quick interop (numpy in/out).
  - VectorizedEnv: the functional core — env.reset(key) -> state,
    env.step(state, action) -> (state, obs, reward, done); vmap/scan it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VectorizedEnv:
    """Functional environment around a DiscreteSystem (or any step fn).

    reward:     (params, x, u, x_next, t) -> scalar
    observe:    (params, x) -> obs           (default: identity)
    done_fn:    (params, x, t) -> bool       (default: never)
    reset_fn:   (params, key) -> x0          (initial-state distribution)
    """

    system: Any  # DiscreteSystem
    reward: Callable
    reset_fn: Callable
    observe: Optional[Callable] = None
    done_fn: Optional[Callable] = None
    max_steps: int = 1000

    def reset(self, params, key):
        x0 = self.reset_fn(params, key)
        k = jnp.zeros((), jnp.int32)
        return (x0, k)

    def obs(self, params, state):
        x, _ = state
        return x if self.observe is None else self.observe(params, x)

    def step(self, params, state, action):
        x, k = state
        t = k.astype(x.dtype) * self.system.time_step
        x_next = self.system.g(params, x, action, t)
        r = self.reward(params, x, action, x_next, t)
        done = k + 1 >= self.max_steps
        if self.done_fn is not None:
            done = jnp.logical_or(done, self.done_fn(params, x_next, t))
        state = (x_next, k + 1)
        return state, self.obs(params, state), r, done

    def rollout(self, params, key, policy, num_steps: int):
        """Whole-episode scan: policy(params, obs, key) -> action.

        Returns (obs_traj, action_traj, reward_traj, done_traj).  vmap over
        `key` for parallel environments.
        """
        state0 = self.reset(params, key)

        def body(carry, step_key):
            state = carry
            o = self.obs(params, state)
            a = policy(params, o, step_key)
            state, o2, r, d = self.step(params, state, a)
            return state, (o, a, r, d)

        keys = jax.random.split(key, num_steps)
        _, traj = jax.lax.scan(body, state0, keys)
        return traj


class DrakeGymEnv:
    """Gymnasium-shaped host wrapper (reset/step with numpy I/O).

    Mirrors pydrake.gym.DrakeGymEnv's surface for drop-in host RL loops;
    the heavy lifting stays jitted (one compiled step).
    """

    def __init__(self, env: VectorizedEnv, params=None, seed: int = 0):
        self.env = env
        self.params = params
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._step = jax.jit(
            lambda s, a: env.step(self.params, s, jnp.asarray(a))
        )
        self._reset = jax.jit(lambda k: env.reset(self.params, k))

    @property
    def num_actions(self) -> int:
        return self.env.system.num_inputs

    def reset(self, seed: Optional[int] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        self._state = self._reset(sub)
        return np.asarray(self.env.obs(self.params, self._state)), {}

    def step(self, action):
        self._state, obs, reward, done = self._step(self._state, action)
        return (
            np.asarray(obs),
            float(reward),
            bool(done),
            False,  # truncated (folded into done via max_steps)
            {},
        )
