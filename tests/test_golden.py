"""Golden-image regression tests: the megakernel oracle at fixed seed is
fully deterministic, so tiny renders are pinned to committed statistics.
Catches any semantic drift in camera/geometry/BSDF/film code
(SURVEY.md §4: golden tests per preset scene at fixed seed/spp)."""

import numpy as np
import pytest

from parallelraytracing_tpu import Film, RenderConfig, Scene, ScenePreset, create_renderer
from parallelraytracing_tpu.core.camera import default_camera

# Per-preset golden stats at 32x24, depth 6, seed 7, 2 frames, jitter on:
# (mean, std, corner-pixel RGB at (0,0) and (23,31)).
def render_stats(preset):
    cfg = RenderConfig(width=32, height=24, max_depth=6, seed=7,
                       intersect_chunk=16, ray_tile=1 << 16)
    scene = Scene(preset)
    film = Film(cfg.width, cfg.height)
    r = create_renderer("megakernel")
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    for _ in range(2):
        r.progressive_render()
    img = np.asarray(film.hdr_average(), np.float64)
    return img


GOLDEN_STATS = {
    # regenerate with: python -m tests.test_golden (CPU platform)
    "material_test": (0.36505205, 0.12013598),
    "cornell": (0.29202405, 0.63088186),
    "light_test": (0.34818144, 0.24988495),
    "default": (0.82172807, 1.32158121),
}


@pytest.mark.parametrize("preset", ["material_test", "cornell",
                                    "light_test", "default"])
def test_golden_statistics(preset):
    img = render_stats(ScenePreset(preset))
    mean, std = GOLDEN_STATS[preset]
    assert img.mean() == pytest.approx(mean, abs=2e-4), \
        f"{preset}: mean drifted to {img.mean():.8f}"
    assert img.std() == pytest.approx(std, abs=2e-3), \
        f"{preset}: std drifted to {img.std():.8f}"


if __name__ == "__main__":
    # Regenerate the golden table.
    for preset in ("material_test", "cornell", "light_test", "default"):
        img = render_stats(ScenePreset(preset))
        print(f'    "{preset}": ({img.mean():.8f}, {img.std():.8f}),')
