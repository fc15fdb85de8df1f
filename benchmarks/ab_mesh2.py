#!/usr/bin/env python
"""Micro-experiments on the mesh path: cluster size sweep + depth split.

Hypothesis: VMEM-row lane extracts (36 scalars per tested triangle)
dominate the bunny frame, so shrinking CLUSTER (fewer triangles tested
per entered leaf) should pay far more than it did for SMEM spheres.
Must be run once per PRT_CLUSTER value (module-level constant).
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

from parallelraytracing_tpu import Film, RenderConfig, Scene
from parallelraytracing_tpu.core.camera import Camera
from parallelraytracing_tpu.core.mesh import load_ply
from parallelraytracing_tpu.engines.fused import FusedRenderer
from parallelraytracing_tpu.utils.sync import device_sync


def mesh_scene(name: str) -> Scene:
    mesh = load_ply(f"/root/reference/assets/models/{name}.ply")
    scene = Scene(preset=None)
    mat = scene.add_lambertian((0.75, 0.65, 0.5))
    scene.add_mesh(mesh, mat, ((8, 8, 8), (0, 180, 0), (0, 8, 0)))
    ground = scene.add_lambertian((0.5, 0.5, 0.5))
    scene.add_quad(100, 100, ground, None)
    light = scene.add_emissive((12, 12, 12))
    scene.add_sphere(3.0, light, ((1, 1, 1), (0, 0, 0), (12, 25, 12)))
    return scene


def main() -> None:
    from parallelraytracing_tpu.ops import pallas_trace as pt
    name = os.environ.get("BENCH_MESH", "bunny")
    width = height = int(os.environ.get("BENCH_RES", 512))
    scene = mesh_scene(name)
    eye = np.array([0.0, 14.0, 28.0])
    look = np.array([0.0, 7.0, 0.0])
    cam = Camera(eye, look - eye, float(width), float(height), 100.0)

    for depth in (1, 8):
        cfg = RenderConfig(width=width, height=height, max_depth=depth,
                           seed=0)
        film = Film(width, height)
        r = FusedRenderer.__new__(FusedRenderer)
        r.accel = "tree"
        r.morton_rays = True
        r.rows = 16
        t0 = time.time()
        r.init(film, scene, cam, cfg)
        r.progressive_render()
        device_sync(film.accum)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(4):
            r.progressive_render()
        device_sync(film.accum)
        dt = (time.time() - t0) / 4
        print(json.dumps({
            "mesh": name, "cluster": pt.CLUSTER, "depth": depth,
            "res": width, "ms_per_frame": round(dt * 1000.0, 2),
            "compile_s": round(compile_s, 1),
            "mean": round(float(np.asarray(film.accum).mean()), 5)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
