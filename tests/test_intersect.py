import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu.core.scene import (
    KIND_QUAD, KIND_SPHERE, KIND_TRIANGLE, Scene)
from parallelraytracing_tpu.ops.intersect import intersect_scene

T_MIN, T_MAX = 1e-3, 1e16


def hit_one(scene, o, d):
    data = scene.build()
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return intersect_scene(data, o, d, T_MIN, T_MAX, chunk=8)


def sphere_scene(center=(0, 0, 0), radius=1.0):
    s = Scene(preset=None)
    m = s.add_lambertian((0.5, 0.5, 0.5))
    s.add_sphere(radius, m, ((1, 1, 1), (0, 0, 0), center))
    return s


class TestSphere:
    def test_front_hit(self):
        h = hit_one(sphere_scene(), (0, 0, 5), (0, 0, -1))
        assert bool(h.hit[0])
        assert h.t[0] == pytest.approx(4.0, abs=1e-5)
        np.testing.assert_allclose(h.pos[0], [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
        assert bool(h.front[0])

    def test_inside_hit_is_backface_with_flipped_normal(self):
        h = hit_one(sphere_scene(), (0, 0, 0), (0, 0, -1))
        assert bool(h.hit[0]) and not bool(h.front[0])
        assert h.t[0] == pytest.approx(1.0, abs=1e-5)
        # geometric normal (0,0,-1) flipped to face the ray origin side
        np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)

    def test_miss(self):
        h = hit_one(sphere_scene(), (0, 0, 5), (0, 1, 0))
        assert not bool(h.hit[0])
        assert np.isinf(h.t[0])

    def test_t_min_skips_self_intersection(self):
        # origin exactly on the surface shooting outward: both roots < tMin
        h = hit_one(sphere_scene(), (0, 0, 1), (0, 0, 1))
        assert not bool(h.hit[0])

    def test_behind_ray_misses(self):
        h = hit_one(sphere_scene(), (0, 0, 5), (0, 0, 1))
        assert not bool(h.hit[0])

    def test_scaled_translated(self):
        s = Scene(preset=None)
        m = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_sphere(1.0, m, ((2, 2, 2), (0, 0, 0), (5, 6, 0)))
        h = hit_one(s, (5, 6, 10), (0, 0, -1))
        assert h.t[0] == pytest.approx(8.0, abs=1e-4)  # radius baked to 2


class TestQuad:
    def quad_scene(self, w=4.0, h=6.0, transform=None):
        s = Scene(preset=None)
        m = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_quad(w, h, m, transform)
        return s

    def test_hit_from_above_is_front(self):
        h = hit_one(self.quad_scene(), (0.5, 3, 1.0), (0, -1, 0))
        assert bool(h.hit[0]) and bool(h.front[0])
        assert h.t[0] == pytest.approx(3.0, abs=1e-5)
        np.testing.assert_allclose(h.normal[0], [0, 1, 0], atol=1e-6)

    def test_hit_from_below_is_back_with_flipped_normal(self):
        h = hit_one(self.quad_scene(), (0, -2, 0), (0, 1, 0))
        assert bool(h.hit[0]) and not bool(h.front[0])
        np.testing.assert_allclose(h.normal[0], [0, -1, 0], atol=1e-6)

    def test_half_extents(self):
        # width=4 -> |x|<2; height=6 -> |z|<3 (shape.h:225-228)
        assert bool(hit_one(self.quad_scene(), (1.9, 1, 0), (0, -1, 0)).hit[0])
        assert not bool(hit_one(self.quad_scene(), (2.1, 1, 0), (0, -1, 0)).hit[0])
        assert bool(hit_one(self.quad_scene(), (0, 1, 2.9), (0, -1, 0)).hit[0])
        assert not bool(hit_one(self.quad_scene(), (0, 1, 3.1), (0, -1, 0)).hit[0])

    def test_parallel_ray_misses(self):
        h = hit_one(self.quad_scene(), (0, 1, 0), (1, 0, 0))
        assert not bool(h.hit[0])

    def test_rotated_quad(self):
        # Cornell side wall: quad rotated 90 about X at x=-5 -> plane z=const
        s = self.quad_scene(10, 10, ((1, 1, 1), (90, 0, 0), (-5, 5, 0)))
        h = hit_one(s, (-5, 5, 10), (0, 0, -1))
        assert bool(h.hit[0])
        assert h.t[0] == pytest.approx(10.0, abs=1e-4)
        assert abs(abs(float(h.normal[0, 2])) - 1.0) < 1e-5


class TestTriangle:
    def tri_scene(self, v0=(-1, 0, 0), v1=(1, 0, 0), v2=(0, 2, 0), **kw):
        s = Scene(preset=None)
        m = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_triangle(v0, v1, v2, material=m, **kw)
        return s

    def test_hit_and_barycentric_position(self):
        h = hit_one(self.tri_scene(), (0, 0.5, 5), (0, 0, -1))
        assert bool(h.hit[0])
        assert h.t[0] == pytest.approx(5.0, abs=1e-5)
        np.testing.assert_allclose(h.pos[0], [0, 0.5, 0], atol=1e-5)

    def test_edges_and_outside(self):
        assert bool(hit_one(self.tri_scene(), (0, 1.0, 5), (0, 0, -1)).hit[0])
        assert not bool(hit_one(self.tri_scene(), (0, 2.5, 5), (0, 0, -1)).hit[0])
        assert not bool(hit_one(self.tri_scene(), (-1, 1.5, 5), (0, 0, -1)).hit[0])

    def test_backface_flips_normal(self):
        # normals +z; ray along +z sees the back
        s = self.tri_scene(n0=(0, 0, 1), n1=(0, 0, 1), n2=(0, 0, 1))
        h = hit_one(s, (0, 0.5, -5), (0, 0, 1))
        assert bool(h.hit[0]) and not bool(h.front[0])
        np.testing.assert_allclose(h.normal[0], [0, 0, -1], atol=1e-5)

    def test_smooth_normal_interpolation(self):
        s = Scene(preset=None)
        m = s.add_lambertian((1, 1, 1))
        inv = 1.0 / np.sqrt(2.0)
        s.add_triangle((-1, 0, 0), (1, 0, 0), (0, 2, 0),
                       n0=(-inv, 0, inv), n1=(inv, 0, inv), n2=(0, 0, 1),
                       material=m)
        h = hit_one(s, (0, 0.0001, 5), (0, 0, -1))  # near v0-v1 midpoint
        assert bool(h.hit[0])
        # halfway between n0 and n1 -> (0,0,1) after normalize
        np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-3)


class TestClosestHit:
    def test_nearest_of_many_wins(self):
        s = Scene(preset=None)
        m = s.add_lambertian((1, 1, 1))
        for z in [0.0, -3.0, -6.0]:
            s.add_sphere(1.0, m, ((1, 1, 1), (0, 0, 0), (0, 0, z)))
        h = hit_one(s, (0, 0, 5), (0, 0, -1))
        assert h.t[0] == pytest.approx(4.0, abs=1e-5)
        assert int(h.idx[0]) == 0 and int(h.kind[0]) == KIND_SPHERE

    def test_mixed_kinds_ordering(self):
        s = Scene(preset=None)
        m = s.add_lambertian((1, 1, 1))
        s.add_sphere(1.0, m, ((1, 1, 1), (0, 0, 0), (0, 0, -4)))
        s.add_quad(10, 10, m, ((1, 1, 1), (90, 0, 0), (0, 0, -1)))  # plane z=-1
        h = hit_one(s, (0, 0, 5), (0, 0, -1))
        assert int(h.kind[0]) == KIND_QUAD
        assert h.t[0] == pytest.approx(6.0, abs=1e-4)

    def test_chunking_invariance(self):
        s = Scene(preset=None)
        m = s.add_lambertian((1, 1, 1))
        rng = np.random.RandomState(0)
        for i in range(37):
            c = rng.uniform(-5, 5, 3)
            s.add_sphere(rng.uniform(0.2, 1.0), m, ((1, 1, 1), (0, 0, 0), c))
        data = s.build()
        o = jnp.asarray(rng.uniform(-8, 8, (64, 3)), jnp.float32)
        d = rng.normal(size=(64, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
        h1 = intersect_scene(data, o, d, T_MIN, T_MAX, chunk=4)
        h2 = intersect_scene(data, o, d, T_MIN, T_MAX, chunk=64)
        np.testing.assert_allclose(np.where(np.isinf(h1.t), 1e30, h1.t),
                                   np.where(np.isinf(h2.t), 1e30, h2.t),
                                   rtol=1e-6)
        np.testing.assert_array_equal(h1.kind, h2.kind)
        np.testing.assert_array_equal(h1.idx, h2.idx)

    def test_empty_scene_misses_everything(self):
        s = Scene(preset=None)
        s.add_lambertian((1, 1, 1))
        h = hit_one(s, (0, 0, 5), (0, 0, -1))
        assert not bool(h.hit[0])
