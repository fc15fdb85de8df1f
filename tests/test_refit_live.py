"""Live per-frame BVH refit (BASELINE config 5): an animated scene where
each frame moves geometry, recomputes leaf AABBs and level-sweep-refits
the tree INSIDE the jitted frame step.  The no-refit run must visibly
break (stale AABBs miss the moved sphere) and the refit run must match a
from-scratch rebuild of the BVH on the moved scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu import Film, RenderConfig, Scene, create_renderer
from parallelraytracing_tpu.core.camera import Camera

pytestmark = pytest.mark.slow  # animated refit renders

CFG = RenderConfig(width=64, height=48, max_depth=4, seed=2,
                   intersect_chunk=32, ray_tile=1 << 16)


def base_scene():
    s = Scene(preset=None)
    red = s.add_lambertian((0.9, 0.1, 0.1))
    s.add_sphere(1.5, red, ((1, 1, 1), (0, 0, 0), (-6, 1.5, 0)))
    blue = s.add_lambertian((0.1, 0.1, 0.9))
    s.add_sphere(1.0, blue, ((1, 1, 1), (0, 0, 0), (3, 1, -2)))
    g = s.add_lambertian((0.6, 0.6, 0.6))
    s.add_quad(40, 40, g, None)
    return s


def animate(scene, frame):
    """Move the red sphere 2.5 units +x per frame (jit-safe)."""
    dx = jnp.zeros_like(scene.sph_center)
    dx = dx.at[0, 0].set(2.5 * frame.astype(jnp.float32))
    return dataclasses.replace(scene, sph_center=scene.sph_center + dx)


def camera():
    eye = np.array([0.0, 10.0, 18.0])
    return Camera(eye, np.array([0.0, 1.0, 0.0]) - eye,
                  float(CFG.width), float(CFG.height), 100.0)


def render_animated(refit: bool, frame: int) -> np.ndarray:
    film = Film(CFG.width, CFG.height)
    r = create_renderer("bvh")
    r.animate = animate
    r.refit = refit
    r.init(film, base_scene(), camera(), CFG)
    r._frame_index = frame  # render exactly this animation frame
    r.progressive_render()
    return np.asarray(film.hdr_average())


def render_rebuilt_oracle(frame: int) -> np.ndarray:
    """Fresh scene with the sphere ALREADY moved + fresh BVH build."""
    s = base_scene()
    moved = jax.device_get(animate(s.build(), jnp.int32(frame)))
    film = Film(CFG.width, CFG.height)
    r = create_renderer("bvh")
    r.init(film, s, camera(), CFG)
    # swap in the moved scene + a rebuilt tree, then render frame `frame`
    # (same RNG stream as render_animated uses for that frame index).
    from parallelraytracing_tpu.accel.lbvh import build_bvh
    import jax as _jax
    moved = _jax.device_put(moved)
    r._scene_data = moved
    r._bvh = _jax.device_put(build_bvh(_jax.device_get(moved)))
    r._frame_index = frame
    r.progressive_render()
    return np.asarray(film.hdr_average())


def test_refit_matches_rebuild_and_stale_breaks():
    frame = 3  # sphere has moved 7.5 units from its build position
    refit_img = render_animated(True, frame)
    oracle = render_rebuilt_oracle(frame)
    stale_img = render_animated(False, frame)

    # Refit tree has the build topology but correct AABBs: closest hits
    # (and therefore the image, same RNG) match the full rebuild exactly.
    np.testing.assert_allclose(refit_img, oracle, atol=1e-6)

    # Stale AABBs miss the moved sphere: the image is visibly wrong.
    diff = np.abs(stale_img - oracle).max()
    assert diff > 0.1, f"stale BVH should visibly break (max diff {diff})"


def test_refit_every_frame_runs():
    film = Film(CFG.width, CFG.height)
    r = create_renderer("bvh")
    r.animate = animate
    r.init(film, base_scene(), camera(), CFG)
    for _ in range(4):
        r.progressive_render()
    img = np.asarray(film.hdr_average())
    assert np.isfinite(img).all()
