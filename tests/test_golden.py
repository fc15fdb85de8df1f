"""Golden-image regression tests: the megakernel oracle at fixed seed is
fully deterministic, so tiny renders are pinned both to committed
statistics (tolerant, diagnostic) and to a PIXEL-EXACT sha256 of the
tonemapped u8 display buffer (strict — a compensating-error pair cannot
slip past it).  Catches any semantic drift in camera/geometry/BSDF/film
code (SURVEY.md §4: golden tests per preset scene at fixed seed/spp).

Regenerate after an INTENTIONAL semantic change with:
    python -m tests.test_golden        (prints both tables; CPU platform
                                        is forced by tests/conftest.py)
"""

import hashlib

import numpy as np
import pytest

from parallelraytracing_tpu import Film, RenderConfig, Scene, ScenePreset, create_renderer
from parallelraytracing_tpu.core.camera import default_camera

PRESETS = ["material_test", "cornell", "light_test", "default"]


# Per-preset goldens at 32x24, depth 6, seed 7, 2 frames, jitter on.
def render_film(preset):
    cfg = RenderConfig(width=32, height=24, max_depth=6, seed=7,
                       intersect_chunk=16, ray_tile=1 << 16)
    scene = Scene(preset)
    film = Film(cfg.width, cfg.height)
    r = create_renderer("megakernel")
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    for _ in range(2):
        r.progressive_render()
    return film


def render_stats(preset):
    return np.asarray(render_film(preset).hdr_average(), np.float64)


def display_sha(film) -> str:
    u8 = np.asarray(film.to_display())
    return hashlib.sha256(u8.tobytes()).hexdigest()


GOLDEN_STATS = {
    "material_test": (0.36505205, 0.12013598),
    "cornell": (0.29202405, 0.63088186),
    "light_test": (0.34818144, 0.24988495),
    "default": (0.82172807, 1.32158121),
}

# sha256 of the 32x24 u8 display buffer (weight-normalize -> Reinhard ->
# gamma 1/2.2 -> round, core/film.py _to_display) at the fixture config.
GOLDEN_SHA256 = {
    "material_test": "a62a8f4bba2769e0a0b1247de7936a3293ffb54b9f8db92cf649d651f528d98f",
    "cornell": "f4256686e793fd39b0bd4f22ab5b4481023bcdbf7a412870c5829cc27f346506",
    "light_test": "ea50a2377e124a7a389c643600ba47b579ac380fdb15bc03044ebf8183ded094",
    "default": "2fa47638ea063a37887cf4760a79e271aa16f8f4f19edab64535fa0012344eb5",
}


@pytest.mark.parametrize("preset", PRESETS)
def test_golden_statistics(preset):
    img = render_stats(ScenePreset(preset))
    mean, std = GOLDEN_STATS[preset]
    assert img.mean() == pytest.approx(mean, abs=2e-4), \
        f"{preset}: mean drifted to {img.mean():.8f}"
    assert img.std() == pytest.approx(std, abs=2e-3), \
        f"{preset}: std drifted to {img.std():.8f}"


@pytest.mark.parametrize("preset", PRESETS)
def test_golden_pixel_exact(preset):
    film = render_film(ScenePreset(preset))
    sha = display_sha(film)
    assert sha == GOLDEN_SHA256[preset], (
        f"{preset}: display buffer changed (sha256 {sha}); if the change "
        f"is an intentional semantic fix, regenerate via "
        f"`python -m tests.test_golden`")


if __name__ == "__main__":
    # Regenerate both golden tables.
    for preset in PRESETS:
        film = render_film(ScenePreset(preset))
        img = np.asarray(film.hdr_average(), np.float64)
        print(f'    "{preset}": ({img.mean():.8f}, {img.std():.8f}),')
    for preset in PRESETS:
        film = render_film(ScenePreset(preset))
        print(f'    "{preset}": "{display_sha(film)}",')
