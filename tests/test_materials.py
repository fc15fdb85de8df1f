import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu.core.scene import Scene
from parallelraytracing_tpu.ops.intersect import HitRecord
from parallelraytracing_tpu.ops.materials import (
    emitted, random_unit_vectors, reflect, refract, scatter, schlick)


def make_hit(n, normal=(0, 0, 1), front=True, mat=0):
    normal = jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (n, 3))
    return HitRecord(
        t=jnp.ones((n,)), hit=jnp.ones((n,), bool),
        pos=jnp.zeros((n, 3)), normal=normal,
        front=jnp.full((n,), front), mat=jnp.full((n,), mat, jnp.int32),
        kind=jnp.zeros((n,), jnp.int32), idx=jnp.zeros((n,), jnp.int32))


def run_scatter(scene, d, hit, seed=0):
    n = hit.mat.shape[0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    unit = random_unit_vectors(k1, n)
    uni = jax.random.uniform(k2, (n,))
    d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return scatter(scene.build(), d, hit, unit, uni)


def test_reflect_and_refract_formulas():
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(reflect(d, n), [[0, 1, 0]], atol=1e-6)
    # straight-on refraction passes through
    np.testing.assert_allclose(refract(d, n, jnp.asarray([0.5])),
                               [[0, -1, 0]], atol=1e-6)
    # Snell at 45deg into denser medium bends toward normal
    d45 = jnp.asarray([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], jnp.float32)
    out = np.asarray(refract(d45, n, jnp.asarray([1.0 / 1.5])))[0]
    sin_out = abs(out[0]) / np.linalg.norm(out)
    assert sin_out == pytest.approx(np.sqrt(0.5) / 1.5, abs=1e-5)


def test_schlick_limits():
    # normal incidence -> r0; grazing -> 1
    assert float(schlick(jnp.float32(1.0), 1.5)) == pytest.approx(
        ((1 - 1.5) / (1 + 1.5)) ** 2, abs=1e-6)
    assert float(schlick(jnp.float32(0.0), 1.5)) == pytest.approx(1.0, abs=1e-6)


def test_random_unit_vectors_are_unit_and_cover_sphere():
    v = np.asarray(random_unit_vectors(jax.random.PRNGKey(3), 4096))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    assert np.abs(v.mean(axis=0)).max() < 0.05  # roughly centered


def test_lambertian_scatters_into_hemisphere_cosine_ish():
    s = Scene(preset=None)
    s.add_lambertian((0.5, 0.25, 0.125))
    out, att, alive = run_scatter(s, (0, 0, -1), make_hit(4096))
    out = np.asarray(out)
    assert np.all(np.asarray(alive))
    np.testing.assert_allclose(np.asarray(att)[0], [0.5, 0.25, 0.125], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    cos = out[:, 2]
    assert np.all(cos > -1e-6)  # normal + unit vec is always upper hemisphere
    # cosine-weighted mean cos = 2/3
    assert cos.mean() == pytest.approx(2.0 / 3.0, abs=0.02)


def test_metal_mirror_and_roughness():
    s = Scene(preset=None)
    s.add_metal((0.9, 0.9, 0.9), 0.0)
    d = np.array([1.0, 0.0, -1.0]) / np.sqrt(2)
    out, att, alive = run_scatter(s, d, make_hit(16))
    expect = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
    np.testing.assert_allclose(np.asarray(out), np.tile(expect, (16, 1)), atol=1e-5)
    assert np.all(np.asarray(alive))

    s2 = Scene(preset=None)
    s2.add_metal((1, 1, 1), 0.5)
    out2, _, alive2 = run_scatter(s2, d, make_hit(4096))
    out2 = np.asarray(out2)
    # perturbed around the mirror direction; paths below horizon are killed
    assert np.asarray(alive2).mean() > 0.9
    cos_to_mirror = out2 @ expect
    assert cos_to_mirror.mean() > 0.8


def test_metal_absorbs_below_horizon():
    s = Scene(preset=None)
    s.add_metal((1, 1, 1), 10.0)  # huge roughness: many dirs below surface
    d = np.array([0.0, 0.0, -1.0])
    _, _, alive = run_scatter(s, d, make_hit(4096))
    frac = np.asarray(alive).mean()
    assert 0.2 < frac < 0.8  # roughly half the sphere is below the horizon


def test_dielectric_total_internal_reflection():
    s = Scene(preset=None)
    s.add_dielectric(1.5)
    # inside glass (back face, ri=1.5), grazing: ri*sin>1 -> always reflect
    d = np.array([np.sin(np.radians(80)), 0.0, -np.cos(np.radians(80))])
    hit = make_hit(256, normal=(0, 0, 1), front=False)
    out, att, alive = run_scatter(s, d, hit)
    np.testing.assert_allclose(np.asarray(att), 1.0, atol=1e-6)
    assert np.all(np.asarray(alive))
    out = np.asarray(out)
    assert np.all(out[:, 2] > 0)  # all reflected, none refracted through


def test_dielectric_straight_on_mostly_refracts():
    s = Scene(preset=None)
    s.add_dielectric(1.5)
    d = np.array([0.0, 0.0, -1.0])
    out, _, _ = run_scatter(s, d, make_hit(4096, front=True))
    out = np.asarray(out)
    frac_refracted = (out[:, 2] < 0).mean()
    r0 = ((1 - 1 / 1.5) / (1 + 1 / 1.5)) ** 2
    assert frac_refracted == pytest.approx(1 - r0, abs=0.02)


def test_emissive_emits_and_kills():
    s = Scene(preset=None)
    s.add_emissive((10, 5, 5))
    data = s.build()
    e = emitted(data, jnp.zeros((4,), jnp.int32))
    np.testing.assert_allclose(np.asarray(e), np.tile([10, 5, 5], (4, 1)))
    _, att, alive = run_scatter(s, (0, 0, -1), make_hit(8))
    assert not np.any(np.asarray(alive))

    s2 = Scene(preset=None)
    s2.add_lambertian((1, 1, 1))
    e2 = emitted(s2.build(), jnp.zeros((4,), jnp.int32))
    np.testing.assert_allclose(np.asarray(e2), 0.0)
