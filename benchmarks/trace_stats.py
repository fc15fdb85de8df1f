#!/usr/bin/env python
"""Traversal diagnostics: where does the fused kernel's time actually go?

Runs pallas_trace with collect_stats=True on the canonical workloads and
prints per-tile counter summaries: slab tests (nodes/clusters), leaves
entered, primitives tested, alive bounces.  The data that decides which
lever to pull next (walk overhead vs leaf tests vs dead-tail bounces).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import jax.numpy as jnp
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
from parallelraytracing_tpu.ops.pallas_trace import LANES, pallas_trace


def stats_for(scene, cam, cfg, accel="auto", frame=1):
    """One frame's traced radiance + per-tile counters via the engine's
    own packed tables (bench.py's direct-call pattern)."""
    film = Film(cfg.width, cfg.height)
    r = FusedRenderer.__new__(FusedRenderer)
    r.accel = accel
    r.sub_rows = 0
    r.init(film, scene, cam, cfg)

    from parallelraytracing_tpu.ops.rays import (frame_stream_seeds,
                                                 generate_camera_rays_ids)
    base = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                              jnp.uint32(frame))
    skey = jax.random.fold_in(base, jnp.uint32(0))
    jseed, s0 = frame_stream_seeds(skey)
    o, d = generate_camera_rays_ids(r._cam_params, cfg.width, cfg.height,
                                    r._ids, None, cfg.jitter,
                                    pix_seed=jseed)
    pix = r._ids.astype(jnp.float32)
    seed = s0[None]
    from parallelraytracing_tpu.engines.tables import trace_tables
    rad, stats = trace_tables(r._tables, o, d, pix, seed, r.rows, cfg,
                              r._interpret, collect_stats=True)
    return np.asarray(rad), np.asarray(stats)


def report(tag, stats, cfg, extra=None):
    s = stats.astype(np.int64)
    n_tiles = len(s)
    out = {
        "tag": tag, "tiles": n_tiles,
        "slab_tests/tile": round(float(s[:, 0].mean()), 1),
        "leaves_entered/tile": round(float(s[:, 1].mean()), 1),
        "prims_tested/tile": round(float(s[:, 2].mean()), 1),
        "alive_bounces/tile mean": round(float(s[:, 3].mean()), 2),
        "alive_bounces p50/p90/max": [
            int(np.percentile(s[:, 3], 50)),
            int(np.percentile(s[:, 3], 90)), int(s[:, 3].max())],
        "prims_tested/ray(elem)": round(float(s[:, 2].sum())
                                        / (n_tiles * 2048), 1),
        "slab/prim work split": round(
            float(s[:, 0].sum() * 25)
            / max(float(s[:, 2].sum() * 40), 1.0), 3),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))
    sys.stdout.flush()


def main() -> None:
    which = os.environ.get("AB_WHICH", "both")
    if which in ("both", "spheres"):
        cfg = RenderConfig(width=1920, height=1080, max_depth=20, seed=0)
        scene = Scene(ScenePreset.RANDOM_BALLS_LARGE)
        eye = np.array([5.0, 5.0, 8.0])
        cam = Camera(eye, -eye, 1920.0, 1080.0, 100.0)
        for accel in os.environ.get("AB_ACCELS", "linear").split(","):
            _, st = stats_for(scene, cam, cfg, accel=accel)
            report(f"spheres_{accel}", st, cfg)

    if which in ("both", "bunny"):
        from benchmarks.ab_session import mesh_scene
        name = os.environ.get("AB_MESH", "bunny")
        cfg = RenderConfig(width=1920, height=1080, max_depth=20, seed=0)
        scene = mesh_scene(name)
        eye = np.array([0.0, 14.0, 28.0])
        look = np.array([0.0, 7.0, 0.0])
        cam = Camera(eye, look - eye, 1920.0, 1080.0, 100.0)
        for accel in os.environ.get("AB_ACCELS_MESH", "tree").split(","):
            _, st = stats_for(scene, cam, cfg, accel=accel)
            report(f"{name}_{accel}", st, cfg)


if __name__ == "__main__":
    main()
