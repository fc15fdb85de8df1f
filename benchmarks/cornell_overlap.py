#!/usr/bin/env python
"""Localize the cornell cross-validation divergence (ref_crossval.py).

The reference's CORNELL preset is geometrically DEGENERATE: the red
wall, green wall and light quads all lie exactly in the z = 0 plane
with overlapping extents (scene.cpp:332-350 — each is the same 10x10
quad rotated (90,0,0) and translated within the plane).  For a ray
hitting the overlap region the true hit t is IDENTICAL for every
overlapping quad, so "which primitive wins" is tie-breaking, and the
reference family itself does not agree on it:

- the reference CPU backend intersects each quad in LOCAL space through
  its own inverse transform and keeps the strictly-nearest squared
  distance (primitive.cpp:21-59) — per-quad rounding noise decides the
  winner, effectively dithering red/green/light per ray;
- the reference OptiX backend bakes quads to world space
  (optix/renderer.cpp:649-671) like this repo does, and leaves equal-t
  resolution to (unspecified) BVH traversal order;
- this repo's engines compute one world-space t (bit-equal across the
  trio) and resolve ties deterministically by the reference's LIST
  order (first added wins — the behavior primitive.cpp's scan has when
  distances compare exactly equal).

This harness proves the cross-val bias lives in that overlap: it
renders cornell on both sides (reference CPU build + oracle), computes
the per-pixel |mean difference|, and splits the bias RMSE inside /
outside the analytically-computed overlap mask (pixels whose primary
ray hits z = 0 inside >= 2 of the three quads).  Expected: outside-mask
bias at the MC noise floor; inside-mask bias O(the light's emission).

Run: python benchmarks/cornell_overlap.py [cpu] [frames] [WxH]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.ref_crossval import (build_harness, render_oracle,
                                     render_reference)


def overlap_mask(w: int, h: int) -> np.ndarray:
    """Pixels whose primary (center) ray hits the z=0 plane inside >= 2
    of cornell's three coplanar quads (red/green/light extents from
    scene.cpp:332-350 after the (90,0,0) rotation)."""
    from parallelraytracing_tpu.core.camera import default_camera
    cam = default_camera(w, h)
    mask = np.zeros((h, w), bool)
    quads = [(-5.0, 5.0), (5.0, 5.0), (0.0, 9.0)]  # (cx, cy), half-ext 10
    for y in range(h):
        for x in range(w):
            o, d = cam.get_camera_ray(x + 0.5, y + 0.5)
            if abs(d[2]) < 1e-12:
                continue
            t = -o[2] / d[2]
            if t <= 1e-3:
                continue
            p = o + t * d
            # floor may occlude (y=0 plane, 10x10): the ray reaches z=0
            # first iff t_floor misses or is farther
            if abs(d[1]) > 1e-12:
                tf = -o[1] / d[1]
                if 1e-3 < tf < t and abs(o[0] + tf * d[0]) < 10.0 \
                        and abs(o[2] + tf * d[2]) < 10.0:
                    continue
            n_in = sum(1 for (cx, cy) in quads
                       if abs(p[0] - cx) < 10.0 and abs(p[1] - cy) < 10.0)
            mask[y, x] = n_in >= 2
    return mask


def main():
    import jax
    argv = sys.argv[1:]
    if argv and argv[0] == "cpu":
        jax.config.update("jax_platforms", "cpu")
        argv = argv[1:]
    frames = int(argv[0]) if argv else 2048
    if len(argv) > 1:
        w, h = map(int, argv[1].split("x"))
    else:
        w, h = 128, 96

    build_harness()
    A = render_reference("cornell", w, h, frames, seed=1337)
    B = render_reference("cornell", w, h, frames, seed=9001)
    C = render_oracle("cornell", w, h, frames, seed=7)
    D = render_oracle("cornell", w, h, frames, seed=8)
    m = overlap_mask(w, h)

    def stats(sel):
        s_r2 = float(np.mean((A - B)[sel] ** 2)) / 2.0
        s_o2 = float(np.mean((C - D)[sel] ** 2)) / 2.0
        d2 = float(np.mean(((A + B) / 2 - (C + D) / 2)[sel] ** 2))
        bias = float(np.sqrt(max(d2 - (s_r2 + s_o2) / 2.0, 0.0)))
        return {"bias_rmse": round(bias, 6),
                "noise_ref": round(float(np.sqrt(s_r2)), 6),
                "noise_oracle": round(float(np.sqrt(s_o2)), 6),
                "pixels": int(sel.sum())}

    out = {"frames": frames, "resolution": f"{w}x{h}",
           "overlap_pixels": int(m.sum()),
           "inside_overlap": stats(m),
           "outside_overlap": stats(~m)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
