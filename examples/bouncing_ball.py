"""Bouncing ball: continuous compliant contact + dense output.

Reference examples/bouncing_ball/ (the canonical continuous-contact demo:
a point-contact ball dropped on the ground, integrated continuously) —
here driven through the continuous MultibodyPlant path
(drake_tpu.contact.plant.make_continuous_contact_system: Hunt-Crossley
normal force + regularized friction) with dense-output interrogation of
the impact times.

Checks: the rebound apex ratio follows the Hunt-Crossley dissipation, and
between impacts the flight is ballistic (apex-to-apex time = 2 sqrt(2h/g)).

Run:  python examples/bouncing_ball.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from drake_tpu.contact.plant import make_continuous_contact_system
    from drake_tpu.geometry import shapes as sh
    from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
    from drake_tpu.multibody.model import FLOATING, ModelBuilder
    from drake_tpu.systems import simulator

    dtype = jnp.float64 if args.cpu else jnp.float32

    radius, mass = 0.05, 0.1
    b = ModelBuilder()
    b.add_body("ball", parent=None, joint_type=FLOATING, mass=mass,
               inertia_com=np.eye(3) * 0.4 * mass * radius**2)
    model, params = b.build(dtype)
    scene = CollisionScene.build([
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=0.4, stiffness=1e12),
        CollisionGeometry(name="ball", body=0, shape=sh.Sphere(radius),
                          friction=0.4, stiffness=2e4, dissipation=0.3),
    ])
    sys_ = make_continuous_contact_system(model, params, scene)

    drop_h = 0.3
    x0 = jnp.asarray([1, 0, 0, 0, 0, 0, radius + drop_h] + [0] * 6, dtype)
    h = 1e-4
    T = 15000
    us = jnp.zeros((T, 0), dtype)
    xs, ts = simulator.simulate(sys_, params, x0, us, h, method="rk4")
    # dense output: query z(t) on a fine grid between the solver knots
    traj = simulator.dense_output(sys_, params, xs, ts, us)
    tq = jnp.linspace(0.0, T * h, 6001)
    z = np.asarray(jax.vmap(lambda t: traj.value(t)[6])(tq))

    # apex detection on the dense trace
    apexes = [
        (float(tq[i]), z[i])
        for i in range(1, len(z) - 1)
        if z[i] > z[i - 1] and z[i] >= z[i + 1] and z[i] > radius + 0.01
    ]
    print(f"drop height {drop_h:.3f} m; {len(apexes)} rebound apexes")
    for t, zz in apexes[:4]:
        print(f"  apex at t={t:.3f}s  height={zz - radius:.4f} m")

    assert len(apexes) >= 2, "ball should bounce at least twice"
    h1 = apexes[0][1] - radius
    h2 = apexes[1][1] - radius
    ratio = h2 / h1
    print(f"apex energy ratio e^2 = {ratio:.3f} (Hunt-Crossley dissipation)")
    assert 0.1 < ratio < 0.95, "dissipation should take energy each impact"

    # ballistic flight check: apex-to-apex time ~ 2 sqrt(2 h2 / g) + contact
    t_flight = apexes[1][0] - apexes[0][0]
    t_ballistic = 2.0 * np.sqrt(2.0 * (h1 + h2) / 2 / 9.81)
    print(f"apex-to-apex {t_flight:.3f}s vs ballistic {t_ballistic:.3f}s")
    assert abs(t_flight - t_ballistic) < 0.25 * t_ballistic
    print("BOUNCING BALL OK")


if __name__ == "__main__":
    main()
