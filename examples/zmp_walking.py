"""ZMP walking plan: footstep sequence -> LIPM preview control -> closed loop.

Reference role: examples/zmp/zmp_example.cc + planning/locomotion/zmp_planner.h
(a ZmpPlanner fed a footstep plan, then the CoM trajectory is tracked by the
time-varying linear policy).  TPU-native shape: the desired ZMP is a pure
function of time (piecewise-constant over stance feet), the Riccati recursion
and the closed-loop rollout are `lax.scan`s, and the whole pipeline (plan +
sim) jits as one program.

Run: python examples/zmp_walking.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--f32", action="store_true", help="TPU mode")
args = parser.parse_args()

import jax
import jax.numpy as jnp

if args.cpu:
    # NB: the JAX_PLATFORMS env var is overridden by the axon sitecustomize
    # on this machine — the config update is the reliable CPU pin.
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

from drake_tpu.control import zmp


def footstep_zmp(ts_step: float, steps: jnp.ndarray):
    """Piecewise-constant desired ZMP: hold each footstep for ts_step."""

    def zmp_d(t):
        i = jnp.clip((t / ts_step).astype(jnp.int32), 0, steps.shape[0] - 1)
        return steps[i]

    return zmp_d


def main():
    dtype = jnp.float32 if args.f32 else jnp.float64
    # 8 alternating footsteps, 0.25 m stride, 0.1 m lateral stance width.
    n_steps = 8
    stride, width = 0.25, 0.10
    xs = stride * jnp.arange(n_steps, dtype=dtype)
    ys = width * jnp.where(jnp.arange(n_steps) % 2 == 0, 1.0, -1.0)
    steps = jnp.stack([xs, ys], axis=1)
    ts_step = 0.5
    t_final = ts_step * n_steps
    height = 0.9  # CoM height (LIPM constant)
    dt = 0.01

    x0 = jnp.asarray([0.0, width, 0.0, 0.0], dtype)  # start over foot 0
    plan = jax.jit(
        lambda x: zmp.plan_zmp(
            footstep_zmp(ts_step, steps), x, height, t_final, dt=dt
        )
    )(x0)

    # Closed loop from a pushed initial state: the TV policy u = -Kx - k
    # recovers and tracks the planned CoM.
    x_pushed = x0 + jnp.asarray([0.02, -0.03, 0.1, 0.05], dtype)

    def step(x, i):
        u = plan.policy(i, x)
        c, cd = x[:2], x[2:]
        x_new = jnp.concatenate([c + dt * cd + 0.5 * dt * dt * u, cd + dt * u])
        cop = c - (height / 9.81) * u
        return x_new, (x_new, cop)

    n = plan.u.shape[0]
    _, (traj, cops) = jax.lax.scan(step, x_pushed, jnp.arange(n))

    # Checks: final CoM near the last footstep line; realized ZMP stays
    # within the stance corridor (|y| <= width + margin).
    com_err = float(jnp.linalg.norm(traj[-1, :2] - plan.com[-1]))
    zmp_y_max = float(jnp.max(jnp.abs(cops[:, 1])))
    zmp_track = float(
        jnp.sqrt(jnp.mean(jnp.sum((plan.cop - jax.vmap(
            footstep_zmp(ts_step, steps))(plan.ts[:-1])) ** 2, axis=1)))
    )
    print(f"planned ZMP tracking rmse     : {zmp_track:.4f} m")
    print(f"pushed closed-loop CoM error  : {com_err:.4f} m (vs plan at T)")
    print(f"max |ZMP_y| under push        : {zmp_y_max:.4f} m "
          f"(corridor {width + 0.05:.2f})")
    ok = com_err < 0.05 and zmp_y_max < width + 0.05
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
