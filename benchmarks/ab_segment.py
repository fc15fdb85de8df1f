#!/usr/bin/env python
"""A/B the wavefront_fused engine (segments + ray sorting) vs fused.

Sphere headline + bunny mesh, sweeping segment length and the
between-segment Morton re-sort."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from parallelraytracing_tpu import Film, RenderConfig, Scene, ScenePreset
from parallelraytracing_tpu.core.camera import Camera
from parallelraytracing_tpu.engines.base import create_renderer
from parallelraytracing_tpu.utils.sync import device_sync

from ab_mesh import mesh_scene  # noqa: E402


def run(tag, engine, scene, cam, cfg, frames=4, **attrs):
    try:
        film = Film(cfg.width, cfg.height)
        r = create_renderer(engine)
        for k, v in attrs.items():
            setattr(r, k, v)
        t0 = time.time()
        r.init(film, scene, cam, cfg)
        r.progressive_render()
        device_sync(film.accum)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(frames):
            r.progressive_render()
        device_sync(film.accum)
        dt = (time.time() - t0) / frames
        res = {"tag": tag, "engine": engine, **attrs,
               "ms_per_frame": round(dt * 1000.0, 2),
               "compile_s": round(compile_s, 1),
               "mean": round(float(np.asarray(film.accum).mean()), 5)}
    except Exception as e:
        res = {"tag": tag, "engine": engine, **attrs,
               "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(res))
    sys.stdout.flush()


def main() -> None:
    width, height, depth = 1920, 1080, 20
    cfg = RenderConfig(width=width, height=height, max_depth=depth, seed=0)

    balls = Scene(ScenePreset.RANDOM_BALLS_LARGE)
    pos = np.array([30.0, 18.0, 30.0])
    cam_b = Camera(pos, -pos, float(width), float(height), 100.0)

    bunny = mesh_scene("bunny")
    eye = np.array([0.0, 14.0, 28.0])
    look = np.array([0.0, 7.0, 0.0])
    cam_m = Camera(eye, look - eye, float(width), float(height), 100.0)

    for seg in (2, 4, 7):
        run("balls", "wavefront_fused", balls, cam_b, cfg, segment=seg)
    run("balls", "wavefront_fused", balls, cam_b, cfg, segment=4,
        sort_rays="")
    for seg in (2, 4):
        run("bunny", "wavefront_fused", bunny, cam_m, cfg, segment=seg)
    run("bunny", "wavefront_fused", bunny, cam_m, cfg, segment=2,
        sort_rays="")


if __name__ == "__main__":
    main()
