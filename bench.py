#!/usr/bin/env python
"""Benchmark: Mrays/sec/chip on the reference's headline workload.

Workload (matching the reference defaults, SURVEY.md §6): scene
RANDOM_BALLS_LARGE (809 primitives), 1920x1080, 1 spp per progressive
frame, max depth 20.  The metric counts every ray actually traced
(camera rays + alive bounce rays, measured by instrumenting one frame)
divided by steady-state wall time per frame on one chip.

Prints ONE JSON line:
  {"metric": "Mrays_per_sec_per_chip", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/200}
vs_baseline is against the 200 Mrays/s/chip north-star (BASELINE.md) —
the reference itself publishes no numbers.

Env knobs: BENCH_WIDTH/HEIGHT/DEPTH/FRAMES/PRESET/ENGINE.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # The remote compile service occasionally hangs for tens of minutes;
    # emit an honest failure record instead of hanging the harness.
    import signal

    def _timeout(signum, frame):
        print(json.dumps({
            "metric": "Mrays_per_sec_per_chip", "value": 0.0,
            "unit": "Mrays/s", "vs_baseline": 0.0,
            "detail": {"error": "bench timed out (TPU compile service)"},
        }))
        sys.stdout.flush()
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "3000")))

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

    from parallelraytracing_tpu import (Film, RenderConfig, Scene,
                                        ScenePreset, create_renderer)
    from parallelraytracing_tpu.core.camera import Camera
    from parallelraytracing_tpu.engines.tracer import count_bounce_rays

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    depth = int(os.environ.get("BENCH_DEPTH", 20))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    preset = ScenePreset(os.environ.get("BENCH_PRESET", "random_balls_large"))
    # Engine preference: explicit env wins; otherwise try the fastest
    # first and fall back if the (flaky) TPU compile service rejects it.
    if "BENCH_ENGINE" in os.environ:
        engine_prefs = [os.environ["BENCH_ENGINE"]]
    else:
        engine_prefs = ["fused", "megakernel"]

    cfg = RenderConfig(width=width, height=height, max_depth=depth, seed=0)
    scene = Scene(preset)

    from parallelraytracing_tpu.utils.sync import device_sync

    # Two views, both reported: the reference's DEFAULT camera
    # (eye (5,5,8) -> origin, main.cpp:142-150) is the headline — the
    # exact workload the reference boots into; the elevated overview
    # shows the whole 809-primitive field (longer mean path).
    cameras = {
        "reference_default": Camera(np.array([5.0, 5.0, 8.0]),
                                    np.array([-5.0, -5.0, -8.0]),
                                    float(width), float(height), 100.0),
        "overview": Camera(np.array([30.0, 18.0, 30.0]),
                           np.array([-30.0, -18.0, -30.0]),
                           float(width), float(height), 100.0),
    }

    def exact_pallas_ray_count(r, n_frames=3) -> float:
        """Average EXACT rays/frame: steps the same pixel-keyed PCG
        streams the fused/wavefront_fused engines trace (same per-frame
        seed chain), via single-bounce Pallas segments."""
        import jax.numpy as jnp

        from parallelraytracing_tpu.engines.megakernel import raygen
        from parallelraytracing_tpu.engines.wavefront_fused import \
            count_frame_rays
        sky = tuple(float(x) for x in np.asarray(r._scene_data.sky))
        total = 0
        for f in range(n_frames):
            base = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed), jnp.uint32(f))
            skey = jax.random.fold_in(base, jnp.uint32(0))
            k_jit, k_path = jax.random.split(skey)
            o, d = raygen(r._cam_params, k_jit, cfg.width, cfg.height,
                          cfg.jitter)
            pix = jnp.arange(cfg.pixel_count, dtype=jnp.float32)
            seed = jax.random.randint(k_path, (1,), 0, 2**31 - 1,
                                      jnp.int32)
            total += int(count_frame_rays(
                o, d, pix, r._sph_tab, r._quad_tab, r._tri_tab,
                r._sph_cl, r._quad_cl, r._tri_cl, r._mats, r._lights_tab,
                seed, r.rows, cfg.max_depth, cfg.t_min, cfg.t_max, sky,
                r._interpret, cfg.russian_roulette_depth, r._vmem_kinds,
                r._nee, tri_cold=getattr(r, "_tri_cold", None)))
        return total / n_frames

    results = {}
    engine = None
    for cam_name, cam in cameras.items():
        film = r = None
        last_err = None
        for name in engine_prefs:
            try:
                film = Film(width, height)
                r = create_renderer(name)
                r.init(film, scene, cam, cfg)
                # Warm up / compile (device_sync: block_until_ready does
                # not actually wait on this TPU plugin backend).
                r.progressive_render()
                device_sync(film.accum)
                engine = name
                break
            except Exception as e:  # compile-service flakiness: fall back
                last_err = e
                print(f"# engine {name} failed: {type(e).__name__}",
                      file=sys.stderr)
        if engine is None:
            raise last_err

        # Rays/frame numerator: exact (same PCG streams as the engine)
        # for the Pallas engines, jnp-threefry estimate otherwise.
        if hasattr(r, "_sph_tab"):
            rays_per_frame = exact_pallas_ray_count(r)
            count_method = "exact_pallas_pcg"
        else:
            rays_per_frame = count_bounce_rays(
                r._scene_data, r._cam_params, jax.random.PRNGKey(123), cfg)
            count_method = "jnp_threefry_estimate"

        t0 = time.time()
        for _ in range(frames):
            r.progressive_render()
        device_sync(film.accum)
        dt = (time.time() - t0) / frames
        results[cam_name] = {
            "mrays": round(rays_per_frame / dt / 1e6, 3),
            "rays_per_frame": int(rays_per_frame),
            "ms_per_frame": round(dt * 1000.0, 2),
            "ray_count_method": count_method,
        }

    mrays = results["reference_default"]["mrays"]
    print(json.dumps({
        "metric": "Mrays_per_sec_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "detail": {
            "engine": engine,
            "preset": preset.value,
            "resolution": f"{width}x{height}",
            "max_depth": depth,
            "camera": "reference_default (eye (5,5,8), main.cpp:142-150)",
            "views": results,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
