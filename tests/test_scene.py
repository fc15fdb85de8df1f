import numpy as np
import pytest

from parallelraytracing_tpu.core.host_rng import MT19937, UniformSceneRng
from parallelraytracing_tpu.core.mesh import Mesh
from parallelraytracing_tpu.core.scene import (
    MAT_DIELECTRIC, MAT_EMISSIVE, MAT_LAMBERTIAN, MAT_METAL, Scene,
    ScenePreset)


def test_mt19937_matches_reference_stream():
    # Known values of the std::mt19937 stream for seed 5489 and 1.
    mt = MT19937(5489)
    assert mt.next_u32() == 3499211612
    mt2 = MT19937(1)
    assert mt2.next_u32() == 1791095845


def test_scene_rng_deterministic():
    a = UniformSceneRng(1337)
    b = UniformSceneRng(1337)
    va = [a.uniform(-40, 40) for _ in range(100)]
    vb = [b.uniform(-40, 40) for _ in range(100)]
    assert va == vb
    assert all(-40 <= v <= 40 for v in va)


@pytest.mark.parametrize("preset,prims", [
    (ScenePreset.DEFAULT, 8),
    (ScenePreset.LIGHT_TEST, 12),
    (ScenePreset.MATERIAL_TEST, 4),
    (ScenePreset.CORNELL, 4),
    (ScenePreset.RANDOM_BALLS_SMALL, 109),
    (ScenePreset.RANDOM_BALLS_MEDIUM, 409),
    (ScenePreset.RANDOM_BALLS_LARGE, 809),
])
def test_preset_primitive_counts(preset, prims):
    # scene.cpp:62-350 + SURVEY.md: LARGE = 800 balls + 8 emissive + ground.
    s = Scene(preset)
    assert s.num_primitives == prims


def test_random_balls_layout_properties():
    s = Scene(ScenePreset.RANDOM_BALLS_LARGE)
    d = s.build()
    c = np.asarray(d.sph_center)
    r = np.asarray(d.sph_radius)
    v = np.asarray(d.sph_valid)
    assert v.sum() == 808
    balls, lights = c[:800], c[800:808]
    # balls rest on the ground: y == radius (scene.cpp:96-101)
    np.testing.assert_allclose(balls[:, 1], r[:800], atol=1e-5)
    assert np.all((balls[:, 0] >= -40) & (balls[:, 0] <= 40))
    # emissive balls float at y=8 with radius 1.5 (scene.cpp:145-158)
    np.testing.assert_allclose(lights[:, 1], 8.0, atol=1e-5)
    np.testing.assert_allclose(r[800:808], 1.5, atol=1e-6)
    types = np.asarray(d.mat_type)
    mats = np.asarray(d.sph_mat)
    assert np.all(types[mats[800:808]] == MAT_EMISSIVE)
    # material mix roughly 65/25/10 (scene.cpp:105-129)
    ball_types = types[mats[:800]]
    frac_lam = (ball_types == MAT_LAMBERTIAN).mean()
    frac_met = (ball_types == MAT_METAL).mean()
    frac_die = (ball_types == MAT_DIELECTRIC).mean()
    assert abs(frac_lam - 0.65) < 0.06
    assert abs(frac_met - 0.25) < 0.06
    assert abs(frac_die - 0.10) < 0.04


def test_build_is_deterministic_and_cached():
    s1 = Scene(ScenePreset.RANDOM_BALLS_SMALL)
    s2 = Scene(ScenePreset.RANDOM_BALLS_SMALL)
    d1, d2 = s1.build(), s2.build()
    np.testing.assert_array_equal(np.asarray(d1.sph_center),
                                  np.asarray(d2.sph_center))
    assert s1.build() is d1  # cached


def test_default_scene_materials():
    s = Scene(ScenePreset.DEFAULT)
    d = s.build()
    types = np.asarray(d.mat_type)
    assert (types == MAT_EMISSIVE).sum() == 3
    assert (types == MAT_DIELECTRIC).sum() == 1
    np.testing.assert_allclose(np.asarray(d.mat_ior)[types == MAT_DIELECTRIC],
                               0.9)  # sub-unity IoR kept (scene.cpp:246)
    # emissive sphere baked with uniform scale 2 (scene.cpp:193-200)
    r = np.asarray(d.sph_radius)
    assert r[0] == pytest.approx(2.0)


def test_sky_light_intensity_recorded():
    assert Scene(ScenePreset.CORNELL).sky_light_intensity == 0.0
    assert Scene(ScenePreset.LIGHT_TEST).sky_light_intensity == 0.0
    assert Scene(ScenePreset.RANDOM_BALLS_SMALL).sky_light_intensity == 1.0


def test_add_mesh_triangulates():
    mesh = Mesh(
        vertices=np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                            np.float32),
        indices=np.asarray([0, 1, 2, 1, 3, 2], np.uint32))
    mesh.compute_vertex_normals()
    s = Scene(preset=None)
    m = s.add_lambertian((1, 1, 1))
    s.add_mesh(mesh, m, ((2, 2, 2), (0, 0, 0), (0, 0, 5)))
    d = s.build()
    assert int(np.asarray(d.tri_valid).sum()) == 2
    np.testing.assert_allclose(np.asarray(d.tri_v0)[0], [0, 0, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.tri_v1)[0], [2, 0, 5], atol=1e-6)
