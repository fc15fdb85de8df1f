import numpy as np
import pytest

from parallelraytracing_tpu.core import geometry as geo


def test_euler_xyz_order():
    # eulerAngleXYZ = Rx @ Ry @ Rz
    a = np.radians([10.0, 20.0, 30.0])
    m = geo.euler_xyz(a)
    expect = geo.rot_x(a[0]) @ geo.rot_y(a[1]) @ geo.rot_z(a[2])
    np.testing.assert_allclose(m, expect, atol=1e-12)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)


def test_make_transform_trs_order():
    m = geo.make_transform((2, 2, 2), (0, 90, 0), (1, 2, 3))
    # scale then rotate then translate: point (1,0,0) -> scale (2,0,0)
    # -> rotY90 (0,0,-2) -> translate (1,2,1)
    p = geo.transform_point(m, (1, 0, 0))
    np.testing.assert_allclose(p, [1, 2, 1], atol=1e-12)


def test_transform_normal_rotates_and_normalizes():
    m = geo.make_transform((3, 3, 3), (90, 0, 0), (5, 6, 7))
    n = geo.transform_normal(np.linalg.inv(m), (0, 1, 0))
    # +Y rotated 90deg about X -> +Z; scale/translation must not matter
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-12)
    assert abs(np.linalg.norm(n) - 1.0) < 1e-12


def test_uniform_scale_extraction_and_rejection():
    m = geo.make_transform((2, 2, 2), (10, 20, 30), (1, 1, 1))
    assert abs(geo.uniform_scale_of(m) - 2.0) < 1e-9
    bad = geo.make_transform((1, 2, 1), (0, 0, 0), (0, 0, 0))
    with pytest.raises(ValueError):
        geo.uniform_scale_of(bad)


def test_quad_aabb_padding():
    c = np.zeros((1, 3))
    u = np.array([[1.0, 0, 0]])
    v = np.array([[0, 0, 2.0]])
    mn, mx = geo.quad_aabb(c, u, v)
    np.testing.assert_allclose(mn[0], [-1.01, -0.01, -2.01])
    np.testing.assert_allclose(mx[0], [1.01, 0.01, 2.01])
