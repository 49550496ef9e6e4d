"""Tutorial 7: rendering and sensors — cameras, point clouds, IMU.

The drake_tpu analog of the reference's rendering tutorial
(tutorials/rendering_multibody_plant.ipynb, which mounts an RgbdSensor on
a plant and renders color/depth/label images): render a plant-following
camera, back-project depth into a point cloud, and read ideal IMU
measurements — everything differentiable and jit-able, because the
renderer is a sphere-traced SDF pipeline, not a rasterizer.

Run:  python tutorials/07_rendering_and_sensors.py     (CPU f64, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry
from drake_tpu.multibody import kinematics as kin
from drake_tpu.multibody.model import FLOATING, ModelBuilder
from drake_tpu.sensors import camera

F64 = jnp.float64

# ---------------------------------------------------------------------------
# 1. A camera over a plant scene.  Geometries can be world-anchored or
#    body-attached; with (model, params, q) the renderer runs forward
#    kinematics so images follow the plant state (the RgbdSensor wiring of
#    the reference tutorial).  render() returns depth (metric), label
#    (geometry index), normal, and a Lambert shade in one pass.
# ---------------------------------------------------------------------------
b = ModelBuilder(gravity=(0.0, 0.0, -9.81))
b.add_body("box", parent=None, joint_type=FLOATING, mass=1.0,
           inertia_com=np.eye(3) * 1e-2)
model, params = b.build(F64)

geoms = [
    CollisionGeometry(name="ground", body=-1, shape=sh.HalfSpace()),
    CollisionGeometry(name="box", body=0, shape=sh.Box((0.3, 0.2, 0.15))),
    CollisionGeometry(name="pillar", body=-1,
                      shape=sh.Cylinder(0.06, 0.5),
                      p_BG=(0.45, -0.3, 0.25)),
]
cam = camera.CameraInfo(width=64, height=48, fov_y=0.9)
X_WC = camera.look_at(eye=(1.3, 0.9, 0.8), target=(0.0, 0.0, 0.15))

q = jnp.asarray([1, 0, 0, 0, 0.0, 0.0, 0.25], F64)  # box pose (floating)
res = camera.render(geoms, cam, X_WC, model, params, q)
hit = np.isfinite(np.asarray(res.depth))
labels, counts = np.unique(np.asarray(res.label)[hit], return_counts=True)
print(f"depth image {res.depth.shape}: {hit.mean() * 100:.0f}% hits, "
      f"range [{float(res.depth[hit].min()):.2f}, "
      f"{float(res.depth[hit].max()):.2f}] m")
print(f"label histogram: "
      f"{ {geoms[k].name: int(c) for k, c in zip(labels, counts)} }")

# The render follows the plant: move the box, pixels change.
q2 = q.at[4].set(0.4)
res2 = camera.render(geoms, cam, X_WC, model, params, q2)
changed = (np.asarray(res.label) != np.asarray(res2.label)).mean()
print(f"moving the box changes {changed * 100:.0f}% of label pixels")

# ---------------------------------------------------------------------------
# 2. Full RGB: materials (diffuse/specular/checker), multiple directional
#    lights, sphere-traced soft shadows — the render_gl/render_vtk role.
#    Everything is jax; jit it like any other function.
# ---------------------------------------------------------------------------
mats = [
    camera.Material(diffuse=(0.85, 0.85, 0.85), checker_scale=2.0,
                    checker_color=(0.15, 0.15, 0.15)),
    camera.Material(diffuse=(0.85, 0.15, 0.15), specular=0.6),
    camera.Material(diffuse=(0.15, 0.3, 0.85)),
]
rgb, _ = jax.jit(
    lambda qq: camera.render_rgb(geoms, cam, X_WC, mats,
                                 model=model, params=params, q=qq)
)(q)
rgb = np.asarray(rgb)
print(f"rgb image {rgb.shape}: mean brightness {rgb.mean():.2f}, "
      f"red-box pixels {(rgb[..., 0] > 2 * rgb[..., 1]).mean() * 100:.0f}%")

# Optional: save to PNG with the dependency-free writer (ImageWriter role).
from drake_tpu.sensors.image_writer import write_png

out = os.path.join("/tmp", "drake_tpu_tutorial7.png")
write_png(out, (rgb * 255).astype(np.uint8))
print(f"wrote {out}")

# ---------------------------------------------------------------------------
# 3. Depth -> point cloud (perception/point_cloud.py, the
#    DepthImageToPointCloud system role): back-project through the
#    intrinsics, transform to world, crop to a workspace box.
# ---------------------------------------------------------------------------
from drake_tpu.perception import point_cloud as pc

cloud = pc.depth_image_to_point_cloud(res.depth, cam)
R_WC, p_WC = X_WC
cloud_W = pc.transform(cloud, R_WC, p_WC)
ws = pc.crop(cloud_W, (-0.5, -0.5, 0.05), (0.6, 0.5, 0.6))
n_valid = int(jnp.sum(ws.valid))
cen = np.asarray(pc.centroid(ws))
print(f"point cloud: {n_valid} workspace points above the ground, "
      f"centroid {np.round(cen, 2)}")

# ---------------------------------------------------------------------------
# 4. IMU: gyroscope + accelerometer on a moving body (systems/sensors
#    role).  The accelerometer differentiates the sensor-point velocity
#    through the plant's kinematics with jax.jvp — exact, no finite
#    differences — and reports proper acceleration (gravity included).
# ---------------------------------------------------------------------------
from drake_tpu.sensors import imu

v = jnp.asarray([0.0, 0.0, 2.0, 0.0, 0.0, 0.0], F64)  # spin about z
w_meas = imu.gyroscope_measurement(model, params, 0, q, v)
# A body spinning at constant rate in free fall: accelerometer at a point
# OFF the axis reads the centripetal acceleration minus gravity.
p_BS = (0.1, 0.0, 0.0)
vdot = jnp.zeros(6, F64)  # steady spin
a_meas = imu.accelerometer_measurement(model, params, 0, q, v, vdot,
                                       p_BS=p_BS)
print(f"gyro: {np.round(np.asarray(w_meas), 3)} rad/s (true wz = 2)")
print(f"accelerometer at r=0.1 m: {np.round(np.asarray(a_meas), 3)} "
      f"(centripetal w^2 r = {2.0**2 * 0.1:.1f}, gravity +9.81 up)")
print("TUTORIAL 7 DONE")
