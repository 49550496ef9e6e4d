"""hardware_sim: generic YAML-scenario-driven simulation runner.

The reference ships examples/hardware_sim/hardware_sim.cc — a single binary
that loads a whole-scenario YAML (scenario.h:32, LoadScenario :95), builds
the plant from the listed model files, wires LCM buses + visualization, and
simulates for `simulation_duration`.  This is the drake_tpu equivalent:

  python examples/hardware_sim.py [--scenario scenario.yaml] [--cpu]
      [--log traffic.log]

Scenario fields (drake_tpu/io/config.py Scenario):
  simulation_duration, random_seed, plant{time_step,...},
  simulator{integration_scheme,max_step_size,...}, model_files[...].

Model files dispatch on extension: .urdf, .sdf, .xml (MJCF).  States are
published on the "STATE" pub/sub channel each step (the LCM-publisher
role); --log tees the traffic into a MessageLog for later playback.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DOUBLE_PENDULUM_URDF = """
<robot name="double_pendulum">
  <link name="base"><inertial><mass value="0"/></inertial></link>
  <link name="upper">
    <inertial><origin xyz="0 0 -0.5"/><mass value="1.0"/>
      <inertia ixx="0.083" iyy="0.083" izz="0.001"/></inertial>
  </link>
  <link name="lower">
    <inertial><origin xyz="0 0 -0.5"/><mass value="1.0"/>
      <inertia ixx="0.083" iyy="0.083" izz="0.001"/></inertial>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/><child link="upper"/>
    <axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/><child link="lower"/>
    <origin xyz="0 0 -1.0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="100" velocity="100"/>
  </joint>
</robot>
"""


def load_model(path_or_xml: str, dtype):
    """Dispatch a model file to its parser (the Parser role,
    reference parsing/parser.h:30-33)."""
    from drake_tpu.multibody import parsing, parsing_mjcf, parsing_sdf

    text = path_or_xml
    name = path_or_xml
    if not path_or_xml.lstrip().startswith("<"):
        with open(path_or_xml) as f:
            text = f.read()
    else:
        name = "<inline>"
    head = text.lstrip()
    if head.startswith("<robot"):
        return parsing.parse_urdf(text, dtype=dtype)
    if head.startswith("<sdf") or head.startswith("<model"):
        return parsing_sdf.parse_sdf(text, dtype=dtype)
    if head.startswith("<mujoco"):
        model, params, _geoms = parsing_mjcf.parse_mjcf(text, dtype=dtype)
        return model, params
    raise ValueError(f"unrecognized model format: {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default=None, help="scenario YAML path")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log", default=None, help="record pub/sub traffic")
    ap.add_argument("--publish-every", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.io.config import load_scenario
    from drake_tpu.io.log import MessageLog
    from drake_tpu.io.pubsub import ArrayPublisher, PubSub
    from drake_tpu.multibody import dynamics as dyn
    from drake_tpu.systems import integrators

    dtype = jnp.float64 if args.cpu else jnp.float32

    if args.scenario:
        scenario = load_scenario(args.scenario)
    else:
        # Built-in demo: a double pendulum, inline (model_files entries may
        # be paths or inline XML).
        from drake_tpu.io.config import Scenario

        scenario = Scenario(
            simulation_duration=2.0,
            model_files=[DOUBLE_PENDULUM_URDF],
        )
    if not scenario.model_files:
        raise SystemExit("scenario lists no model_files")
    if len(scenario.model_files) > 1:
        print(
            f"warning: {len(scenario.model_files)} model files listed; "
            "simulating the first (multi-model merging: use ModelBuilder)"
        )

    model, params = load_model(scenario.model_files[0], dtype)
    nq, nv = model.num_positions, model.num_velocities
    print(
        f"model: {model.num_bodies} bodies, nq={nq}, nv={nv}; "
        f"duration={scenario.simulation_duration}s, "
        f"scheme={scenario.simulator.integration_scheme}"
    )

    # Perturbed initial state from the scenario seed (the reference's
    # RandomSimulation seeding role).
    key = jax.random.PRNGKey(scenario.random_seed)
    q0 = 0.1 * jax.random.normal(key, (nq,), dtype)
    x0 = jnp.concatenate([q0, jnp.zeros(nv, dtype)])

    step_fn = integrators.get(scenario.simulator.integration_scheme)
    dt = scenario.simulator.max_step_size
    n_steps = int(round(scenario.simulation_duration / dt))

    def f(p, x, u, t):
        q, v = x[:nq], x[nq:]
        a = dyn.forward_dynamics(model, p, q, v, jnp.zeros(nv, dtype))
        return jnp.concatenate([v, a])

    u = jnp.zeros(nv, dtype)

    @jax.jit
    def rollout(x):
        def body(xk, k):
            x_next = step_fn(f, params, xk, u, k * dt, dt)
            return x_next, x_next

        return jax.lax.scan(body, x, jnp.arange(n_steps, dtype=dtype))[1]

    xs = np.asarray(rollout(x0))

    # Publish the trajectory (LcmPublisherSystem role) + optional log.
    node = PubSub("memq://hardware_sim")
    log = None
    if args.log:
        log = MessageLog(args.log, "w")
        t_holder = [0.0]
        log.attach(node, clock=lambda: t_holder[0])
    pub = ArrayPublisher(node, "STATE")
    for k in range(0, n_steps, args.publish_every):
        if log is not None:
            t_holder[0] = (k + 1) * dt
        pub.publish(t=np.asarray([(k + 1) * dt]), q=xs[k, :nq], v=xs[k, nq:])
    if log is not None:
        log.close()
        print(f"traffic log written: {args.log}")

    E0 = float(dyn.total_energy(model, params, x0[:nq], x0[nq:]))
    E1 = float(dyn.total_energy(model, params, jnp.asarray(xs[-1, :nq]),
                                jnp.asarray(xs[-1, nq:])))
    print(
        f"final q = {np.round(xs[-1, :nq], 4)}; energy drift "
        f"{abs(E1 - E0):.2e} (E0 = {E0:.4f})"
    )
    print("HARDWARE_SIM OK")
    node.close()


if __name__ == "__main__":
    main()
