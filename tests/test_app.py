"""Application-layer units: CLI arg surface and viewer input handling."""

import json

import numpy as np
import pytest

from parallelraytracing_tpu.cli import build_argparser

pytestmark = pytest.mark.slow  # viewer loop renders (minutes-scale on one core)


def test_cli_defaults_match_reference_workload():
    args = build_argparser().parse_args([])
    assert args.scene == "random_balls_large"  # scene.h:20 default preset
    assert args.depth == 20                    # cpu/renderer.h:34 budget
    assert args.spp == 1                       # 1 spp per progressive frame


def test_cli_flags_parse():
    args = build_argparser().parse_args([
        "--scene", "cornell", "--engine", "fused", "--width", "64",
        "--height", "48", "--frames", "3", "--spp", "2", "--depth", "7",
        "--seed", "9", "--no-jitter", "--eye", "1", "2", "3",
        "--look-at", "0", "1", "0", "--out", "/tmp/x.png",
        "--checkpoint", "/tmp/c.npz", "--platform", "cpu", "--stats"])
    assert args.engine == "fused" and args.eye == [1.0, 2.0, 3.0]
    assert args.no_jitter and args.stats


def test_viewer_control_moves_camera():
    from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.core.camera import default_camera
    from parallelraytracing_tpu.viewer.app import ViewerState

    cfg = RenderConfig(width=16, height=8, max_depth=2, seed=0,
                       intersect_chunk=8, ray_tile=1 << 10)
    state = ViewerState(Scene(ScenePreset.MATERIAL_TEST),
                        default_camera(16, 8), cfg, "megakernel")
    p0 = state.camera.position.copy()
    state.control({"kind": "zoom", "dy": -120})
    moved = state.camera.update(0.016)
    assert moved and not np.allclose(state.camera.position, p0)

    state.control({"kind": "engine", "name": "wavefront"})
    assert state.switch_to == "wavefront"
    state.control({"kind": "engine", "name": "not_an_engine"})
    assert state.switch_to == "wavefront"  # unknown names ignored

    # malformed input must not raise
    state.control({})
    state.control({"kind": "rotate"})


def test_viewer_png_bytes_roundtrip(tmp_path):
    from parallelraytracing_tpu.utils.png import read_png
    from parallelraytracing_tpu.viewer.app import encode_png_bytes as _png_bytes

    img = (np.arange(8 * 6 * 4).reshape(6, 8, 4) % 256).astype(np.uint8)
    data = _png_bytes(img)
    p = tmp_path / "f.png"
    p.write_bytes(data)
    np.testing.assert_array_equal(read_png(str(p)), img)


def test_viewer_engine_cache_reuses_initialized_renderers():
    """Warm multi-backend switching (VERDICT r2): the first switch to an
    engine pays init, switching BACK reuses the cached instance (the
    reference Inits all backends once up front, main.cpp:165-166)."""
    from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.core.camera import default_camera
    from parallelraytracing_tpu.viewer.app import ViewerState

    cfg = RenderConfig(width=16, height=8, max_depth=2, seed=0,
                       intersect_chunk=8, ray_tile=1 << 10)
    state = ViewerState(Scene(ScenePreset.MATERIAL_TEST),
                        default_camera(16, 8), cfg, "megakernel")
    first = state.renderer

    state._switch_engine("wavefront")
    wf = state.renderer
    assert wf is not first
    state._switch_engine("megakernel")
    assert state.renderer is first        # came from the cache
    state._switch_engine("wavefront")
    assert state.renderer is wf           # cached too
    state.renderer.progressive_render()   # still renders after reuse
    assert state.film.sample_count == 1


def test_viewer_motion_preview_drops_resolution():
    """Motion-adaptive resolution: while the camera moves the loop
    renders the low-res preview twin (scale^2 fewer rays — the
    interactive-orbit path); at rest the full-res progressive
    refinement resumes from a cleared film."""
    from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.core.camera import default_camera
    from parallelraytracing_tpu.viewer.app import ViewerState

    cfg = RenderConfig(width=32, height=16, max_depth=2, seed=0,
                       intersect_chunk=8, ray_tile=1 << 10)
    state = ViewerState(Scene(ScenePreset.MATERIAL_TEST),
                        default_camera(32, 16), cfg, "megakernel",
                        preview_scale=2)
    assert state.preview_cfg.width == 16 and state.preview_cfg.height == 8

    state._step(0.016)                     # at rest: full-res frame
    assert not state.previewing and state.film.sample_count == 1

    state.control({"kind": "zoom", "dy": -120})
    state._step(0.016)                     # moving: preview frame
    assert state.previewing
    assert state.preview_film.sample_count == 1
    assert state.film.sample_count == 1    # full film untouched by preview

    state._step(0.016)                     # velocity spent: back to full res
    assert not state.previewing
    assert state.film.sample_count == 1    # cleared, one fresh frame

    state._step(0.016)                     # refinement continues
    assert state.film.sample_count == 2


def test_viewer_denoise_toggle_produces_frames():
    """The live a-trous toggle: denoised display has the same shape/dtype
    as the raw path, differs from it on a noisy accumulation, and the
    toggle round-trips through control()."""
    from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.core.camera import default_camera
    from parallelraytracing_tpu.viewer.app import ViewerState

    cfg = RenderConfig(width=16, height=8, max_depth=2, seed=0,
                       intersect_chunk=8, ray_tile=1 << 10)
    state = ViewerState(Scene(ScenePreset.MATERIAL_TEST),
                        default_camera(16, 8), cfg, "megakernel")
    state.control({"kind": "denoise", "on": True})
    assert state.denoise
    state.renderer.progressive_render()
    raw = state.film.display_numpy()
    den = state._denoised_display()
    assert den.shape == raw.shape and den.dtype == raw.dtype
    assert not np.array_equal(den, raw)
    state.control({"kind": "denoise", "on": False})
    assert not state.denoise
