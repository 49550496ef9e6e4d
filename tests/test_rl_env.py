"""pydrake.gym-role tests: functional env + gym host wrapper.

A random policy on a pendulum-balance env: shapes, vmapped parallel
environments, episode termination, and a sanity learning signal (holding
torque beats zero torque near upright).
"""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.rl.env import DrakeGymEnv, VectorizedEnv
from drake_tpu.systems.base import DiscreteSystem

F64 = jnp.float64


def _pendulum_env(max_steps=50):
    h = 0.05

    def g(params, x, u, t):
        th, w = x[0], x[1]
        wd = -9.81 * jnp.sin(th + jnp.pi) + u[0]  # th=0 is upright
        return jnp.array([th + h * w, w + h * wd])

    sys_ = DiscreteSystem(g=g, num_states=2, num_inputs=1, time_step=h)

    def reward(params, x, u, x_next, t):
        return -(x_next[0] ** 2) - 0.1 * x_next[1] ** 2 - 1e-3 * u[0] ** 2

    def reset_fn(params, key):
        return 0.1 * jax.random.normal(key, (2,), F64)

    def done_fn(params, x, t):
        return jnp.abs(x[0]) > 1.5  # fell over

    return VectorizedEnv(
        system=sys_, reward=reward, reset_fn=reset_fn, done_fn=done_fn,
        max_steps=max_steps,
    )


class TestVectorizedEnv:
    def test_reset_step_shapes(self):
        env = _pendulum_env()
        state = env.reset(None, jax.random.PRNGKey(0))
        state, obs, r, done = env.step(None, state, jnp.array([0.0]))
        assert obs.shape == (2,)
        assert not bool(done)
        assert np.isfinite(float(r))

    def test_vmapped_parallel_envs(self):
        env = _pendulum_env()
        keys = jax.random.split(jax.random.PRNGKey(1), 64)

        def one(key):
            state = env.reset(None, key)
            state, obs, r, d = env.step(None, state, jnp.array([0.0]))
            return obs, r

        obs, rs = jax.jit(jax.vmap(one))(keys)
        assert obs.shape == (64, 2)
        assert rs.shape == (64,)
        # different keys -> different states
        assert float(jnp.std(obs[:, 0])) > 1e-3

    def test_rollout_scan_and_termination(self):
        env = _pendulum_env(max_steps=30)

        def zero_policy(params, obs, key):
            return jnp.zeros(1, F64)

        obs, acts, rs, dones = env.rollout(
            None, jax.random.PRNGKey(2), zero_policy, 60)
        assert obs.shape == (60, 2)
        assert bool(dones[-1])  # max_steps or fell

    def test_stabilizing_policy_beats_zero(self):
        env = _pendulum_env(max_steps=40)

        def pd_policy(params, obs, key):
            return jnp.array([-20.0 * obs[0] - 5.0 * obs[1]])

        def zero_policy(params, obs, key):
            return jnp.zeros(1, F64)

        _, _, r_pd, _ = env.rollout(None, jax.random.PRNGKey(3), pd_policy, 40)
        _, _, r0, _ = env.rollout(None, jax.random.PRNGKey(3), zero_policy, 40)
        assert float(jnp.sum(r_pd)) > float(jnp.sum(r0))


class TestDrakeGymEnv:
    def test_gym_surface(self):
        genv = DrakeGymEnv(_pendulum_env(), seed=0)
        obs, info = genv.reset()
        assert obs.shape == (2,)
        for _ in range(5):
            obs, r, done, trunc, info = genv.step(np.array([0.1]))
        assert obs.shape == (2,)
        assert isinstance(r, float)
        assert genv.num_actions == 1
