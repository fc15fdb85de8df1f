#!/usr/bin/env python
"""Fidelity harness: image-space RMSE between engines at equal spp.

The BASELINE gate is RMSE < 1e-3 vs the CUDA/OptiX reference at equal spp
on converged accumulations; the CUDA binary cannot run here, so the
megakernel jnp engine — whose geometry/BSDF/tonemap semantics replicate
the reference formula-by-formula with file:line citations — serves as the
oracle, and every other engine is gated against it (the reference's own
acceptance process was eyeballing backends against each other,
refactor.md:84; this automates it with numbers).

RMSE is computed on the tonemapped display image in [0,1] (what the gate
means perceptually) and on linear HDR for reference.

Run: python benchmarks/fidelity.py [cpu] [frames]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render(engine, preset, cfg, frames):
    import numpy as np

    from parallelraytracing_tpu import Film, Scene, create_renderer
    from parallelraytracing_tpu.core.camera import default_camera

    scene = Scene(preset)
    film = Film(cfg.width, cfg.height)
    r = create_renderer(engine)
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    for _ in range(frames):
        r.progressive_render()
    hdr = np.asarray(film.hdr_average())
    ldr = np.asarray(film.to_display()).astype(np.float64)[..., :3] / 255.0
    return hdr, ldr


def main():
    import jax
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    import numpy as np

    from parallelraytracing_tpu import RenderConfig, ScenePreset

    cfg = RenderConfig(width=128, height=96, max_depth=10, seed=0,
                       intersect_chunk=64, ray_tile=1 << 16)
    results = {}
    for preset in (ScenePreset.MATERIAL_TEST, ScenePreset.CORNELL,
                   ScenePreset.DEFAULT):
        oracle_hdr, oracle_ldr = render("megakernel", preset, cfg, frames)
        for engine in ("wavefront", "wavefront_bvh", "bvh", "fused", "wavefront_fused"):
            hdr, ldr = render(engine, preset, cfg, frames)
            rmse_ldr = float(np.sqrt(np.mean((ldr - oracle_ldr) ** 2)))
            rmse_hdr = float(np.sqrt(np.mean((hdr - oracle_hdr) ** 2)))
            results[f"{preset.value}/{engine}"] = {
                "rmse_ldr": round(rmse_ldr, 6),
                "rmse_hdr": round(rmse_hdr, 6),
            }
            print(f"{preset.value:16s} {engine:10s} "
                  f"rmse_ldr={rmse_ldr:.6f} rmse_hdr={rmse_hdr:.6f}",
                  flush=True)
    print(json.dumps({"frames": frames, "results": results}))


if __name__ == "__main__":
    main()
