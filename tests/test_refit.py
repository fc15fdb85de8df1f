"""BVH refit: AABBs track moved primitives and traversal stays exact."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu import Scene, ScenePreset
from parallelraytracing_tpu.accel.lbvh import build_bvh
from parallelraytracing_tpu.accel.refit import build_refit_plan, refit_bvh
from parallelraytracing_tpu.accel.traverse import bvh_intersect_scene
from parallelraytracing_tpu.ops.intersect import intersect_scene

T_MIN, T_MAX = 1e-3, 1e16


def test_refit_reproduces_build_aabbs():
    scene = Scene(ScenePreset.RANDOM_BALLS_SMALL).build()
    bvh = build_bvh(scene)
    plan = build_refit_plan(bvh)
    re = refit_bvh(bvh, scene, plan)
    np.testing.assert_allclose(np.asarray(re.node_min),
                               np.asarray(bvh.node_min), atol=1e-5)
    np.testing.assert_allclose(np.asarray(re.node_max),
                               np.asarray(bvh.node_max), atol=1e-5)


def test_refit_tracks_moved_spheres_and_traversal_agrees():
    scene = Scene(ScenePreset.RANDOM_BALLS_SMALL).build()
    bvh = build_bvh(scene)
    plan = build_refit_plan(bvh)

    # Move every sphere: orbit-ish offset.
    moved = dataclasses.replace(
        scene, sph_center=scene.sph_center + jnp.asarray([3.0, 1.0, -2.0]))
    re = refit_bvh(bvh, moved, plan)

    # Root must contain all moved spheres.
    c = np.asarray(moved.sph_center)[np.asarray(moved.sph_valid)]
    r = np.asarray(moved.sph_radius)[np.asarray(moved.sph_valid)][:, None]
    assert (np.asarray(re.node_min)[0] <= (c - r).min(0) + 1e-4).all()
    assert (np.asarray(re.node_max)[0] >= (c + r).max(0) - 1e-4).all()

    # Traversal over the refit tree matches brute force on the moved scene.
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.uniform(-30, 30, (256, 3)), jnp.float32)
    d = rng.normal(size=(256, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    hb = intersect_scene(moved, o, d, T_MIN, T_MAX, 32)
    ht = bvh_intersect_scene(moved, re, o, d, T_MIN, T_MAX)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
    np.testing.assert_array_equal(np.asarray(hb.idx), np.asarray(ht.idx))


def test_refit_is_jittable():
    import jax

    scene = Scene(ScenePreset.MATERIAL_TEST).build()
    bvh = build_bvh(scene)
    plan = build_refit_plan(bvh)

    @jax.jit
    def step(scene, bvh):
        return refit_bvh(bvh, scene, plan).node_min

    out = step(scene, bvh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(bvh.node_min),
                               atol=1e-5)
