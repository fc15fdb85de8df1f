#!/usr/bin/env python
"""A/B the fused engine's culling + coherence levers on real TPU.

Grid: accel {tree, linear} x morton rays {on, off} x tile rows {8, 16}
on the headline workload (RANDOM_BALLS_LARGE, 1080p, depth 20).  Prints
one JSON line per config with steady-state ms/frame; results land in
benchmarks/RESULTS.md.
"""

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
from parallelraytracing_tpu.engines.fused import FusedRenderer
from parallelraytracing_tpu.utils.sync import device_sync


def run(accel: str, morton: bool, rows: int, cfg, scene, cam,
        frames: int = 4) -> dict:
    film = Film(cfg.width, cfg.height)
    r = FusedRenderer.__new__(FusedRenderer)
    r.accel = accel
    r.morton_rays = morton
    r.rows = rows
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
    return {"accel": accel, "morton": morton, "rows": rows,
            "ms_per_frame": round(dt * 1000.0, 2),
            "compile_s": round(compile_s, 1),
            "mean": round(float(np.asarray(film.accum).mean()), 5)}


def main() -> None:
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    depth = int(os.environ.get("BENCH_DEPTH", 20))
    preset = ScenePreset(os.environ.get("BENCH_PRESET",
                                        "random_balls_large"))
    cfg = RenderConfig(width=width, height=height, max_depth=depth, seed=0)
    scene = Scene(preset)
    pos = np.array([30.0, 18.0, 30.0])
    cam = Camera(pos, -pos, float(width), float(height), 100.0)

    configs = [
        ("linear", False, 16),   # round-1 committed default (baseline)
        ("tree", True, 16),
        ("tree", True, 8),
        ("linear", True, 16),
        ("tree", False, 16),
        ("tree", True, 4),
    ]
    for accel, morton, rows in configs:
        try:
            res = run(accel, morton, rows, cfg, scene, cam)
        except Exception as e:
            res = {"accel": accel, "morton": morton, "rows": rows,
                   "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(res))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
