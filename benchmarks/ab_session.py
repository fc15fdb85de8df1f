#!/usr/bin/env python
"""Session A/B driver: measure the fused engine on the two canonical
workloads (sphere headline + bunny mesh) across lever settings.

Levers this round: compressed material fold (always on — baseline is the
previous commit's numbers in RESULTS.md), FMS slab precompute, in-kernel
sub-tile blocks (PRT_SUBROWS analogue via the sub_rows attribute).

Prints one JSON line per config."""

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


def run(tag, scene, cam, cfg, sub_rows=0, accel=None, frames=4):
    film = Film(cfg.width, cfg.height)
    if os.environ.get("AB_ENGINE") == "wavefront_fused":
        from parallelraytracing_tpu.engines.wavefront_fused import \
            WavefrontFusedRenderer
        r = WavefrontFusedRenderer.__new__(WavefrontFusedRenderer)
        if os.environ.get("AB_VMEM_THRESHOLD"):
            r.vmem_threshold = int(os.environ["AB_VMEM_THRESHOLD"])
        if accel is not None:
            r.accel = accel
        return _run_body(tag, film, r, scene, cam, cfg, sub_rows, frames)
    r = FusedRenderer.__new__(FusedRenderer)
    if os.environ.get("AB_VMEM_THRESHOLD"):
        r.vmem_threshold = int(os.environ["AB_VMEM_THRESHOLD"])
    if accel is not None:
        r.accel = accel
    r.sub_rows = sub_rows
    return _run_body(tag, film, r, scene, cam, cfg, sub_rows, frames)


def _run_body(tag, film, r, scene, cam, cfg, sub_rows, frames):
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
    from parallelraytracing_tpu.ops import pallas_trace as pt
    print(json.dumps({
        "tag": tag, "engine": type(r).__name__, "sub_rows": sub_rows,
        "accel": r.accel, "tri_cluster": pt.TRI_CLUSTER,
        "segment": getattr(r, "segment", None),
        "ms_per_frame": round(dt * 1000.0, 2),
        "compile_s": round(compile_s, 1),
        "mean": round(float(np.asarray(film.accum).mean()), 5)}))
    sys.stdout.flush()


def main() -> None:
    which = os.environ.get("AB_WHICH", "both")
    subs = [int(s) for s in
            os.environ.get("AB_SUBS", "0").split(",")]
    accels = os.environ.get("AB_ACCELS", "").split(",")

    if which in ("both", "spheres"):
        cfg = RenderConfig(width=1920, height=1080, max_depth=20, seed=0)
        scene = Scene(ScenePreset.RANDOM_BALLS_LARGE)
        eye = np.array([5.0, 5.0, 8.0])   # reference default camera
        cam = Camera(eye, -eye, 1920.0, 1080.0, 100.0)
        for a in (accels or [None]):
            for s in subs:
                run("spheres_ref", scene, cam, cfg, sub_rows=s,
                    accel=a or None)

    if which in ("both", "bunny"):
        cfg = RenderConfig(width=1920, height=1080, max_depth=20, seed=0)
        scene = mesh_scene(os.environ.get("AB_MESH", "bunny"))
        eye = np.array([0.0, 14.0, 28.0])
        look = np.array([0.0, 7.0, 0.0])
        cam = Camera(eye, look - eye, 1920.0, 1080.0, 100.0)
        for a in (accels or ["tree"]):
            for s in subs:
                run("bunny", scene, cam, cfg, sub_rows=s,
                    accel=a or "tree")


if __name__ == "__main__":
    main()
