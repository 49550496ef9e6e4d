"""Tutorial 2: contact simulation with SAP and gradient-based MPC through it.

The drake_tpu analog of the reference's multibody-contact tutorials: a ball
drops on the ground under the SAP convex contact solver
(multibody/contact_solvers/sap), then we differentiate THROUGH the contact
step (implicit-function-theorem custom_vjp) — the capability that powers the
flagship iiwa contact-implicit MPC benchmark (bench.py).

Run:  python tutorials/02_contact_and_mpc.py        (CPU f64, ~30 s)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# 1. A floating ball over the ground plane.  Collision geometry attaches to
#    bodies by index; body=-1 means the world.
# ---------------------------------------------------------------------------
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import ModelBuilder

b = ModelBuilder()
b.add_body("ball", parent=None, joint_type="floating", mass=1.0,
           inertia_com=np.eye(3) * (0.4 * 0.1 ** 2))
model, params = b.build(jnp.float64)
geoms = [
    CollisionGeometry(name="ball", body=0, shape=sh.Sphere(0.1),
                      friction=0.6, stiffness=1e5, dissipation=0.1),
    CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                      friction=0.6, stiffness=1e10, dissipation=0.1),
]
scene = CollisionScene.build(geoms)

# ---------------------------------------------------------------------------
# 2. The discrete contact step (MultibodyPlant time_step>0 + SapDriver role):
#    one call assembles the SAP problem from (q, v, tau) and solves it.
# ---------------------------------------------------------------------------
from drake_tpu.contact import plant as cplant

h = 0.005
dsys = cplant.make_discrete_system(model, params, scene, h)

q0 = jnp.asarray([1.0, 0, 0, 0, 0.0, 0.0, 0.5])  # quaternion + xyz, 0.5 m up
x0 = jnp.concatenate([q0, jnp.zeros(6)])


def rollout(x, n):
    def step(x, _):
        x1 = dsys.g(params, x, jnp.zeros(6), 0.0)
        return x1, x1

    _, xs = jax.lax.scan(step, x, None, length=n)
    return xs


xs = rollout(x0, 300)  # 1.5 s
z = np.asarray(xs[:, 6])
print(f"drop: z goes 0.500 -> min {z.min():.3f} -> settles {z[-1]:.3f} "
      f"(sphere radius 0.1)")
assert abs(z[-1] - 0.1) < 5e-3, "ball should rest on the surface"

# ---------------------------------------------------------------------------
# 3. Differentiate through contact.  The SAP solve carries an IFT custom_vjp
#    (contact/sap.py, the sap_solver.cc:137 AutoDiff role), so gradients of a
#    rollout loss w.r.t. the initial state are exact at the converged
#    solution — no smoothing hacks.
# ---------------------------------------------------------------------------
def final_height(x_init):
    return rollout(x_init, 80)[-1, 6]


g = jax.grad(final_height)(x0)
print(f"d final_z / d initial_z = {float(g[6]):.3f} "
      "(ball in flight: ~1; after impact: <1)")

# ---------------------------------------------------------------------------
# 4. Optimize THROUGH stick/slip transitions: choose a launch speed so
#    sliding friction brings the ball to rest exactly at the target.  The
#    loss rolls through the friction-decelerated slide (and the eventual
#    stick), and plain gradient descent on the IFT gradients solves it —
#    the same mechanism that powers the flagship iiwa contact MPC
#    (bench.py), without needing an actuated robot in the scene.
# ---------------------------------------------------------------------------
target_x = 0.3
x_rest = jnp.concatenate(
    [jnp.asarray([1.0, 0, 0, 0, 0.0, 0.0, 0.0999]), jnp.zeros(6)])


@jax.jit
def land_x(v_launch):
    x = x_rest.at[10].set(v_launch)  # body-frame vx
    return rollout(x, 200)[-1, 4]  # 1 s later


@jax.jit
def loss_and_grad(v_launch):
    loss = lambda vl: (land_x(vl) - target_x) ** 2
    return jax.value_and_grad(loss)(v_launch)


v = jnp.asarray(0.5)
for i in range(15):
    L, g = loss_and_grad(v)
    v = v - 0.5 * g
final_x = float(land_x(v))
print(f"optimized launch speed {float(v):.3f} m/s -> ball stops at "
      f"x={final_x:.3f} (target {target_x})")
assert abs(final_x - target_x) < 0.02
print("TUTORIAL 2 OK")
