import math

import numpy as np

from parallelraytracing_tpu.core.camera import Camera, default_camera
from parallelraytracing_tpu.ops.rays import generate_camera_rays


def test_device_rays_match_host_reference():
    cam = default_camera(64, 48)
    o, d = generate_camera_rays(cam.ray_params(), 64, 48, key=None,
                                jitter=False)
    o = np.asarray(o).reshape(48, 64, 3)
    d = np.asarray(d).reshape(48, 64, 3)
    for (px, py) in [(0, 0), (63, 47), (32, 24), (5, 40)]:
        ho, hd = cam.get_camera_ray(px + 0.5, py + 0.5)
        np.testing.assert_allclose(o[py, px], ho, atol=1e-5)
        np.testing.assert_allclose(d[py, px], hd, atol=1e-5)


def test_center_ray_points_at_focus():
    cam = default_camera(640, 480)
    _, d = cam.get_camera_ray(320.0, 240.0)
    expect = -cam.position / np.linalg.norm(cam.position)
    np.testing.assert_allclose(d, expect, atol=1e-6)


def test_fov_is_one_radian_vertical():
    cam = Camera((0, 0, 0), (0, 0, -1), 100, 100)
    _, d_top = cam.get_camera_ray(50.0, 0.0)
    _, d_bot = cam.get_camera_ray(50.0, 100.0)
    angle = math.acos(np.clip(np.dot(d_top, d_bot), -1, 1))
    assert abs(angle - 1.0) < 1e-3  # tan(0.5) half-fov => 1 rad total


def test_orbit_controls_velocity_model():
    cam = default_camera(64, 64)
    p0 = cam.position.copy()
    moved = cam.update(0.016)
    assert not moved
    cam.zoom(1.0)
    moved = cam.update(0.016)
    assert moved
    # zoom moves along front by offset*dt*smoothness (8.0)
    np.testing.assert_allclose(cam.position, p0 + cam.front * 1.0 * 0.016 * 8.0)
    # velocity zeroed when smoothing disabled
    assert cam.update(0.016) is False

    cam2 = default_camera(64, 64)
    d_before = cam2.front.copy()
    cam2.rotate(0.0, 90.0 / (0.016 * 8.0))
    cam2.update(0.016)
    # rotated about Y: front stays unit, orthonormal basis preserved
    assert abs(np.linalg.norm(cam2.front) - 1) < 1e-9
    assert abs(np.dot(cam2.right, cam2.front)) < 1e-9
    assert abs(np.dot(cam2.right, cam2.up)) < 1e-9
    assert not np.allclose(cam2.front, d_before)
