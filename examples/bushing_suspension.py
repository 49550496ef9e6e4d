"""Force elements demo: a bushing-suspended block with spring tethers.

Exercises the ForceElement family (reference multibody/tree/force_element.h
and examples/simple_gripper which suspends its gripper on springs): a
floating block hangs from a welded anchor through a LinearBushingRollPitchYaw
and two LinearSpringDampers, is released off-equilibrium, and must settle —
with the energy ledger (kinetic + gravity + elastic) decreasing
monotonically through the dampers.

Run: python examples/bushing_suspension.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--f32", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if args.f32 else jnp.float64

    from drake_tpu.multibody import dynamics as dyn
    from drake_tpu.multibody import force_elements as fel
    from drake_tpu.multibody import plant
    from drake_tpu.multibody.model import ModelBuilder
    from drake_tpu.systems import simulator

    b = ModelBuilder()
    b.add_body("anchor", parent=None, joint_type="weld", mass=0.0)
    b.add_body(
        "block", parent="anchor", joint_type="floating", mass=2.0,
        inertia_com=np.diag([0.02, 0.03, 0.04]),
    )
    model, params = b.build(dtype)

    feb = fel.ForceElementBuilder(model)
    feb.add_bushing(
        "anchor", "block",
        X_AF_xyz=(0.0, 0.0, 0.5),
        torque_stiffness=(6.0, 6.0, 4.0), torque_damping=(0.5, 0.5, 0.3),
        force_stiffness=(300.0, 300.0, 250.0), force_damping=(8.0, 8.0, 6.0),
    )
    # two lateral tethers
    feb.add_linear_spring_damper(
        "anchor", (0.4, 0.0, 0.5), "block", (0.1, 0.0, 0.0),
        free_length=0.3, stiffness=80.0, damping=2.0)
    feb.add_linear_spring_damper(
        "anchor", (-0.4, 0.0, 0.5), "block", (-0.1, 0.0, 0.0),
        free_length=0.3, stiffness=80.0, damping=2.0)
    fe, fp = feb.build(dtype)

    sys_ = plant.make_system(
        model, params,
        applied_forces=lambda p, q, v, t: fel.generalized_forces(
            model, p, fe, fp, q, v))

    def energy(x):
        q, v = x[: model.num_positions], x[model.num_positions:]
        return (dyn.total_energy(model, params, q, v)
                + fel.spring_potential_energy(model, params, fe, fp, q))

    x0 = model.default_state(dtype)
    x0 = x0.at[4:7].set(jnp.array([0.12, -0.08, 0.35], dtype))  # perturbed

    n, dt = 4000, 0.002
    us = jnp.zeros((n, 0), dtype)
    xs, _ = simulator.simulate(sys_, params, x0, us, dt)

    es = np.array([float(energy(xs[i])) for i in range(0, n, 200)])
    drops = np.diff(es)
    v_final = float(jnp.linalg.norm(xs[-1, model.num_positions:]))
    p_final = np.asarray(xs[-1, 4:7])
    print(f"energy ledger: {es[0]:.4f} J -> {es[-1]:.4f} J "
          f"(monotone decreasing: {bool(np.all(drops <= 1e-9))})")
    print(f"final block position: {p_final}, |v| = {v_final:.2e}")
    settled = v_final < 1e-2 and bool(np.all(drops <= 1e-9))
    print("SUSPENSION SETTLE SUCCESS" if settled
          else "SUSPENSION SETTLE FAILURE")
    return 0 if settled else 1


if __name__ == "__main__":
    raise SystemExit(main())
