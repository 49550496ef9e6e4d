"""Tutorial 6: hydroelastic contact — patches, non-convex meshes, reporting.

The drake_tpu analog of the reference's hydroelastic tutorials
(tutorials/hydroelastic_contact_basics.ipynb and
hydroelastic_contact_nonconvex_mesh.ipynb): what a compliant contact PATCH
buys over a point contact, how to turn it on, how non-convex meshes join
the pipeline through baked SDF grids, and how to read the per-patch
results the way the reference's ContactResultsToLcm + meshcat pipeline
does.

Run:  python tutorials/06_hydroelastic_contact.py     (CPU f64, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drake_tpu.contact import plant as cplant
from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry, CollisionScene
from drake_tpu.multibody.model import FLOATING, ModelBuilder
from drake_tpu.systems import simulator

F64 = jnp.float64

# ---------------------------------------------------------------------------
# 1. Point contact vs a hydroelastic patch.  A point contact carries force
#    through ONE point: zero patch extent, so a rolling ball never feels
#    rolling resistance or torsional friction.  Setting
#    `hydroelastic_modulus` on a geometry switches supported pairs to a
#    QUADRATURE PATCH (geometry/scene.py _hydro_patch): a ring of weighted
#    contact points over the flattened cap whose per-point stiffness
#    integrates the reference's pressure field p = E * phi-hat
#    (hydroelastic_contact_basics.ipynb's elastic foundation model).
# ---------------------------------------------------------------------------


def make_ball(hydro: bool):
    b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
    m, r = 0.5, 0.1
    b.add_body("ball", parent=None, joint_type=FLOATING, mass=m,
               inertia_com=np.eye(3) * 0.4 * m * r * r)
    model, params = b.build(F64)
    kwargs = dict(name="ball", body=0, shape=sh.Sphere(r), friction=0.6,
                  stiffness=2e5, dissipation=0.2)
    if hydro:
        kwargs.update(hydroelastic_modulus=5e4, hydro_rings=2)
    scene = CollisionScene.build([
        CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace(),
                          friction=0.6),
        CollisionGeometry(**kwargs),
    ])
    return model, params, scene, r


for hydro in (False, True):
    model, params, scene, r = make_ball(hydro)
    n_slots = scene.num_contacts
    # Spin the resting ball about the vertical axis: only a patch with
    # EXTENT can produce the torsional friction that stops it.
    h = 1e-3
    dsys = cplant.make_discrete_system(model, params, scene, h)
    # Settle into the compliant equilibrium first, THEN kick the spin.
    x0 = model.default_state(F64).at[6].set(r * 0.999)
    xs = simulator.simulate_discrete(dsys, params, x0,
                                     jnp.zeros((300, 0), F64))
    x1 = xs[-1].at[7 + 2].set(8.0)  # wz, body frame
    xs = simulator.simulate_discrete(dsys, params, x1,
                                     jnp.zeros((800, 0), F64))
    wz = float(xs[-1, 7 + 2])
    print(f"{'hydro patch' if hydro else 'point contact'}: "
          f"{n_slots} contact slot(s); spin 8.0 -> {wz:.2f} rad/s after 0.8 s")

# Expected: the point contact keeps spinning (no torsional friction at a
# point); the patch's distributed friction brakes the spin.

# ---------------------------------------------------------------------------
# 2. The per-patch story: step once and read the aggregated surface data —
#    the ContactResultsToLcmSystem role (contact/contact_results.py).  The
#    reference visualizes these exact quantities (force/moment at the
#    patch centroid, per-quadrature-point traction).
# ---------------------------------------------------------------------------
from drake_tpu.contact import contact_results as cr

model, params, scene, r = make_ball(hydro=True)
dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
x0 = model.default_state(F64).at[6].set(r * 0.999)
xs = simulator.simulate_discrete(dsys, params, x0, jnp.zeros((1500, 0), F64))
q = xs[-1, :7]
_, _, sol, contact = cplant.step_with_forces(
    model, params, scene, q, jnp.zeros(6, F64), jnp.zeros(6, F64), 1e-3)
msg = cr.build_contact_results(model, scene, contact,
                               np.asarray(sol.gamma), 1e-3, t=0.4)
surf = msg.hydroelastic_contacts[0]
print(f"patch report: {len(surf.p_WV)} quadrature points, "
      f"F_Ac_W = {np.round(surf.force_C_W, 3)} N "
      f"(ball weight {0.5 * 9.81:.2f} N), "
      f"centroid z = {surf.centroid_W[2]:.4f} m")

# ---------------------------------------------------------------------------
# 3. Non-convex meshes.  The reference's nonconvex-mesh tutorial feeds a
#    bowl/bell mesh to the hydroelastic pipeline; here a triangle mesh is
#    BAKED ONCE into a signed-distance voxel grid (MeshSdf.from_mesh) and
#    then behaves like any analytic SDF shape — contact, hydro patches,
#    MPM coupling, rendering — with no runtime mesh queries.  A convex
#    hull would FILL the bowl; the SDF keeps the dip, so the ball settles
#    INSIDE it.
# ---------------------------------------------------------------------------
from drake_tpu.geometry.mesh_io import make_terrain_mesh

n = 11
gx = np.linspace(-0.3, 0.3, n)
X, Y = np.meshgrid(gx, gx, indexing="ij")
heights = 0.12 - 0.09 * np.exp(-((X / 0.12) ** 2 + (Y / 0.12) ** 2))
verts, faces = make_terrain_mesh(heights, -0.3, -0.3, gx[1] - gx[0], 0.05)
bowl = sh.MeshSdf.from_mesh(verts, faces, resolution=40)  # watertight solid

model, params = (lambda b: (b.add_body(
    "ball", parent=None, joint_type=FLOATING, mass=0.2,
    inertia_com=np.eye(3) * 0.4 * 0.2 * 0.04**2) or b.build(F64)))(
        ModelBuilder(gravity=(0.0, 0.0, -9.81)))
scene = CollisionScene.build([
    CollisionGeometry(name="bowl", body=-1, shape=bowl, friction=0.4),
    CollisionGeometry(name="ball", body=0, shape=sh.Sphere(0.04),
                      friction=0.4, stiffness=2e5, dissipation=0.5),
])
dsys = cplant.make_discrete_system(model, params, scene, 1e-3)
x0 = model.default_state(F64).at[4].set(0.08).at[6].set(0.25)  # offset drop
xs = simulator.simulate_discrete(dsys, params, x0,
                                 jnp.zeros((1500, 0), F64))
p = np.asarray(xs[-1, 4:7])
print(f"ball settles at {np.round(p, 3)} — inside the dip "
      f"(|xy| = {np.hypot(p[0], p[1]):.3f} m, z < 0.12: {p[2] < 0.12})")
assert np.hypot(p[0], p[1]) < 0.06 and p[2] < 0.12
print("TUTORIAL 6 DONE")
