"""Wavefront engine: exact parity vs the megakernel oracle (the
backend-vs-backend regression the reference only ever planned,
refactor.md:84 'Run CPU/GPU regression renders to verify parity')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu import Film, RenderConfig, Scene, ScenePreset, create_renderer
from parallelraytracing_tpu.core.camera import default_camera
from parallelraytracing_tpu.engines.megakernel import raygen
from parallelraytracing_tpu.engines.tracer import trace_paths
from parallelraytracing_tpu.engines.wavefront import wavefront_trace

pytestmark = pytest.mark.slow  # wavefront compaction renders


def small_cfg(**kw):
    base = dict(width=48, height=32, max_depth=6, samples_per_frame=1,
                seed=5, intersect_chunk=32, ray_tile=1 << 16, jitter=True)
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("preset", [
    ScenePreset.MATERIAL_TEST, ScenePreset.DEFAULT, ScenePreset.CORNELL,
    ScenePreset.LIGHT_TEST])
def test_wavefront_bitmatches_megakernel(preset):
    # Pixel-keyed RNG makes the two engines produce IDENTICAL radiance for
    # the same (seed, frame) when the pool is a single tile.
    cfg = small_cfg()
    scene = Scene(preset).build()
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    key = jax.random.PRNGKey(7)
    o, d = raygen(cam, key, cfg.width, cfg.height, False)
    mk = np.asarray(trace_paths(scene, o, d, key, cfg))
    wf = np.asarray(wavefront_trace(scene, o, d, key, cfg))
    np.testing.assert_array_equal(mk, wf)


def test_wavefront_multi_tile_matches_single_tile():
    # Queue-proportional tiling must not change physics (only ordering).
    cfg1 = small_cfg(ray_tile=1 << 16)   # single tile
    cfgn = small_cfg(ray_tile=512)       # 3 tiles of the 1536-ray pool
    scene = Scene(ScenePreset.MATERIAL_TEST).build()
    cam = jnp.asarray(default_camera(cfg1.width, cfg1.height).ray_params())
    key = jax.random.PRNGKey(1)
    o, d = raygen(cam, key, cfg1.width, cfg1.height, False)
    a = np.asarray(wavefront_trace(scene, o, d, key, cfg1))
    b = np.asarray(wavefront_trace(scene, o, d, key, cfgn))
    np.testing.assert_array_equal(a, b)


def test_wavefront_engine_progressive():
    cfg = small_cfg()
    scene = Scene(ScenePreset.CORNELL)
    film = Film(cfg.width, cfg.height)
    r = create_renderer("wavefront")
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    r.progressive_render()
    r.progressive_render()
    img = np.asarray(film.hdr_average())
    assert np.isfinite(img).all() and (img >= 0).all()
    assert film.sample_count == 2


def test_engine_names_registered():
    from parallelraytracing_tpu import available_engines
    names = available_engines()
    assert "megakernel" in names and "wavefront" in names
