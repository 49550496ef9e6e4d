"""Sensor + perception tests (reference systems/sensors/test/
gyroscope_test.cc, accelerometer_test.cc, depth_image_to_point_cloud
tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from drake_tpu.geometry import shapes as sh
from drake_tpu.geometry.scene import CollisionGeometry
from drake_tpu.multibody import dynamics as dyn
from drake_tpu.multibody.model import ModelBuilder
from drake_tpu.perception import point_cloud as pc
from drake_tpu.sensors import imu
from drake_tpu.sensors.camera import CameraInfo, look_at, render

F64 = jnp.float64


def _pendulum():
    b = ModelBuilder()
    b.add_body(
        "arm", parent=None, joint_type="revolute", mass=1.0,
        com=(0, 0, -0.5), inertia_com=np.diag([0.05, 0.05, 1e-4]),
        axis=(0, 1, 0),
    )
    return b.build(F64)


class TestImu:
    def test_gyroscope_reads_joint_rate(self):
        model, params = _pendulum()
        q = jnp.asarray([0.3], F64)
        v = jnp.asarray([1.7], F64)
        w_S = imu.gyroscope_measurement(model, params, 0, q, v)
        np.testing.assert_allclose(np.asarray(w_S), [0.0, 1.7, 0.0],
                                   atol=1e-12)

    def test_accelerometer_at_rest_reads_gravity(self):
        model, params = _pendulum()
        q = jnp.zeros(1, F64)
        v = jnp.zeros(1, F64)
        vdot = jnp.zeros(1, F64)
        f = imu.accelerometer_measurement(model, params, 0, q, v, vdot)
        np.testing.assert_allclose(np.asarray(f), [0, 0, 9.81], atol=1e-12)

    def test_accelerometer_centripetal(self):
        """Sensor at r below the pivot, constant rate w: specific force =
        centripetal (w^2 r, toward pivot = +z_S) + gravity component."""
        model, params = _pendulum()
        q = jnp.asarray([0.0], F64)
        w = 2.0
        v = jnp.asarray([w], F64)
        vdot = jnp.zeros(1, F64)
        r = 0.5
        f = imu.accelerometer_measurement(
            model, params, 0, q, v, vdot, p_BS=jnp.asarray([0, 0, -r], F64)
        )
        # a_WS = +w^2 r z (toward pivot); f = a - g = (0,0, w^2 r + 9.81).
        np.testing.assert_allclose(
            np.asarray(f), [0, 0, w * w * r + 9.81], atol=1e-9
        )

    def test_accelerometer_consistent_with_dynamics(self):
        """Free swing: f = R^T(a - g) with a from forward dynamics; check
        against a finite-difference of the sensor-point velocity."""
        model, params = _pendulum()
        q = jnp.asarray([0.6], F64)
        v = jnp.asarray([0.8], F64)
        vdot = dyn.forward_dynamics(model, params, q, v, jnp.zeros(1, F64))
        p_BS = jnp.asarray([0, 0, -1.0], F64)
        f = imu.accelerometer_measurement(
            model, params, 0, q, v, vdot, p_BS=p_BS
        )
        # FD of velocity along the trajectory.
        from drake_tpu.multibody.plant import qdot_from_v
        from drake_tpu.sensors.imu import _sensor_point_velocity

        eps = 1e-6
        qdot = qdot_from_v(model, params, q, v)
        vp, _, R_WB = _sensor_point_velocity(
            model, params, 0, p_BS, q + eps * qdot, v + eps * vdot
        )
        vm, _, _ = _sensor_point_velocity(
            model, params, 0, p_BS, q - eps * qdot, v - eps * vdot
        )
        a_fd = (vp - vm) / (2 * eps)
        f_fd = R_WB.T @ (a_fd - params.gravity)
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(f_fd), atol=2e-5
        )


class TestDepthCamera:
    def _scene(self):
        return [
            CollisionGeometry(
                name="ball", body=-1, shape=sh.Sphere(0.2),
                p_BG=np.array([0.0, 0.0, 0.5]),
            ),
            CollisionGeometry(name="floor", body=-1, shape=sh.HalfSpace()),
        ]

    def test_depth_and_label(self):
        geoms = self._scene()
        cam = CameraInfo(width=32, height=24)
        X_WC = look_at(eye=(2.0, 0.0, 0.5), target=(0.0, 0.0, 0.5))
        out = render(geoms, cam, X_WC, num_steps=80)
        H, W = 24, 32
        center = np.asarray(out.depth)[H // 2, W // 2]
        # Looking straight at the sphere: depth = 2.0 - 0.2.
        np.testing.assert_allclose(center, 1.8, atol=2e-2)
        assert int(out.label[H // 2, W // 2]) == 0  # the sphere
        # Bottom rows see the floor (label 1), top rows background (-1).
        assert int(out.label[H - 1, W // 2]) == 1
        assert int(out.label[0, W // 2]) == -1
        assert not bool(jnp.isfinite(out.depth[0, W // 2]))

    def test_normals_point_at_camera_for_sphere_center(self):
        geoms = self._scene()
        cam = CameraInfo(width=17, height=13)
        X_WC = look_at(eye=(2.0, 0.0, 0.5), target=(0.0, 0.0, 0.5))
        out = render(geoms, cam, X_WC, num_steps=80)
        n = np.asarray(out.normal)[6, 8]
        np.testing.assert_allclose(n, [1.0, 0.0, 0.0], atol=5e-2)

    def test_point_cloud_roundtrip(self):
        """Back-projected depth pixels land on the sphere surface."""
        geoms = self._scene()
        cam = CameraInfo(width=32, height=24)
        X_WC = look_at(eye=(2.0, 0.0, 0.5), target=(0.0, 0.0, 0.5))
        out = render(geoms, cam, X_WC, num_steps=80)
        sphere_mask = np.asarray(out.label) == 0
        depth = jnp.where(jnp.asarray(sphere_mask), out.depth, jnp.inf)
        cloud = pc.depth_image_to_point_cloud(depth, cam, X_WC=X_WC)
        pts = np.asarray(cloud.xyz)[np.asarray(cloud.valid)]
        r = np.linalg.norm(pts - np.array([0, 0, 0.5]), axis=1)
        assert len(pts) > 20
        np.testing.assert_allclose(r, 0.2, atol=2e-2)


class TestPointCloudOps:
    def test_crop_and_centroid(self):
        xyz = jnp.asarray(
            [[0, 0, 0], [1, 1, 1], [5, 5, 5], [0.5, 0.5, 0.5]], jnp.float32
        )
        cloud = pc.PointCloud(xyz=xyz, valid=jnp.ones(4, bool))
        cropped = pc.crop(cloud, (0, 0, 0), (2, 2, 2))
        assert int(cropped.valid.sum()) == 3
        c = np.asarray(pc.centroid(cropped))
        np.testing.assert_allclose(c, [0.5, 0.5, 0.5], atol=1e-6)

    def test_voxel_downsample(self):
        rng = np.random.default_rng(0)
        pts = rng.random((200, 3)).astype(np.float32) * 0.1  # dense cluster
        cloud = pc.PointCloud(
            xyz=jnp.asarray(pts), valid=jnp.ones(200, bool)
        )
        down = pc.voxel_downsample(cloud, voxel_size=0.05, max_points=64)
        n = int(down.valid.sum())
        assert 1 <= n <= 8  # 2x2x2 voxel grid over [0, 0.1)^3


class TestColorImage:
    def test_color_image_uses_labels_and_shade(self):
        from drake_tpu.sensors.camera import color_image

        geoms = [
            CollisionGeometry(
                name="ball", body=-1, shape=sh.Sphere(0.2),
                p_BG=np.array([0.0, 0.0, 0.5]),
            ),
            CollisionGeometry(name="floor", body=-1, shape=sh.HalfSpace()),
        ]
        cam = CameraInfo(width=32, height=24)
        X_WC = look_at(eye=(2.0, 0.0, 0.5), target=(0.0, 0.0, 0.5))
        out = render(geoms, cam, X_WC, num_steps=80)
        colors = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])  # red, blue
        img = np.asarray(color_image(out, colors))
        assert img.shape == (24, 32, 3)
        c = img[12, 16]  # sphere center: red channel only, shaded
        assert c[0] > 0.1 and c[1] == 0.0 and c[2] == 0.0
        f = img[23, 16]  # floor: blue only
        assert f[2] > 0.1 and f[0] == 0.0
        b = img[0, 16]  # background: black
        np.testing.assert_allclose(b, 0.0)


class TestImageWriter:
    """image_writer.h role: camera frames to numbered PNG files."""

    def test_png_round_trip_via_stdlib(self, tmp_path):
        import zlib

        from drake_tpu.sensors.image_writer import (
            ImageWriter,
            read_png_size,
            write_png,
        )

        rgb = (np.arange(12 * 16 * 3) % 255).reshape(12, 16, 3).astype(
            np.uint8)
        p = str(tmp_path / "rgb.png")
        write_png(p, rgb)
        assert read_png_size(p) == (16, 12)
        # decode the IDAT and verify pixel payload survives
        data = open(p, "rb").read()
        idat_start = data.index(b"IDAT") + 4
        idat_len = int.from_bytes(data[idat_start - 8: idat_start - 4], "big")
        raw = zlib.decompress(data[idat_start: idat_start + idat_len])
        # strip per-row filter bytes
        rows = [raw[r * (16 * 3 + 1) + 1:(r + 1) * (16 * 3 + 1)]
                for r in range(12)]
        np.testing.assert_array_equal(
            np.frombuffer(b"".join(rows), np.uint8).reshape(12, 16, 3), rgb)

    def test_float_depth_normalization_and_numbering(self, tmp_path):
        from drake_tpu.sensors.image_writer import ImageWriter, read_png_size

        w = ImageWriter(str(tmp_path), label="depth")
        depth = np.linspace(0.5, 3.0, 8 * 10).reshape(8, 10)
        p0 = w.save(depth)
        p1 = w.save(depth)
        assert p0.endswith("depth_000000.png")
        assert p1.endswith("depth_000001.png")
        assert read_png_size(p0) == (10, 8)
