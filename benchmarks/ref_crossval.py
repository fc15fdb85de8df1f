#!/usr/bin/env python
"""Cross-validation against the REFERENCE'S OWN CPU renderer.

Every fidelity number elsewhere in this repo is measured against the
megakernel jnp oracle; this harness retires the "oracle validates
itself" objection by rendering the same presets with the reference's
untouched CPU backend (/root/reference/src/backend/cpu/renderer.cpp:
59-103 + src/core/*, built headless by benchmarks/refharness/) and
comparing converged equal-spp HDR images.

Matching conditions (both sides):
- camera: the viewer default, eye (5,5,8) -> origin, focal 100
  (main.cpp:142-150 == core.camera.default_camera);
- pixel CENTERS, no jitter (cpu/renderer.cpp:45);
- depth 20 (cpu/renderer.h:34), tMin 1e-3, sky (0.4, 0.3, 0.6);
- independent RNG streams (std::rand vs threefry) -> agreement is
  measured on CONVERGED accumulations; the residual is MC noise
  ~ sigma/sqrt(spp) plus any true semantic divergence.

Because BOTH sides carry independent MC noise, the raw cross-RMSE floor
is sqrt(sigma_ref^2 + sigma_orc^2)/sqrt(spp) — for the enclosed
emissive scenes (cornell) pushing that below 1e-3 would need ~1M spp.
So besides the equal-spp RMSE table, this harness renders each side
TWICE with independent seeds and decomposes:

    mean((mean(A,B) - mean(C,D))^2) = bias^2 + (s_r^2 + s_o^2)/2
    s_r^2 ~ mean((A - B)^2) / 2,   s_o^2 ~ mean((C - D)^2) / 2

reporting bias_rmse = sqrt(max(0, .)) — the noise-free semantic
divergence between the reference renderer and the oracle.  A true
formula difference shows up as a bias floor that no spp removes; pure
MC noise cancels in expectation.

Run: python benchmarks/ref_crossval.py [cpu] [frames] [WxH]
Writes a JSON line; record the table in benchmarks/RESULTS.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HARNESS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "refharness")
REFCPU = "/tmp/refcpu"


def build_harness() -> None:
    subprocess.run(["make", "-C", HARNESS_DIR], check=True,
                   stdout=subprocess.DEVNULL)


def read_pfm(path: str):
    import numpy as np
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.fromfile(f, dtype="<f4" if scale < 0 else ">f4",
                           count=w * h * 3)
    img = data.reshape(h, w, 3)
    return img[::-1]  # PFM rows are bottom-to-top


def render_reference(preset: str, w: int, h: int, frames: int, seed: int):
    out = tempfile.mktemp(suffix=".pfm")
    subprocess.run([REFCPU, preset, str(w), str(h), str(frames),
                    str(seed), out], check=True,
                   stderr=subprocess.DEVNULL)
    img = read_pfm(out)
    os.unlink(out)
    return img


def render_oracle(preset: str, w: int, h: int, frames: int, seed: int):
    import numpy as np

    from parallelraytracing_tpu import (Film, RenderConfig, Scene,
                                        ScenePreset, create_renderer)
    from parallelraytracing_tpu.core.camera import default_camera

    cfg = RenderConfig(width=w, height=h, max_depth=20, seed=seed,
                       jitter=False,  # the CPU backend shoots pixel centers
                       intersect_chunk=64, ray_tile=1 << 16)
    scene = Scene(ScenePreset(preset))
    film = Film(w, h)
    r = create_renderer("megakernel")
    r.init(film, scene, default_camera(w, h), cfg)
    for _ in range(frames):
        r.progressive_render()
    return np.asarray(film.hdr_average())


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
    import numpy as np

    build_harness()
    results = {}
    for preset in ("material_test", "cornell", "light_test", "default"):
        A = render_reference(preset, w, h, frames, seed=1337)
        B = render_reference(preset, w, h, frames, seed=9001)
        C = render_oracle(preset, w, h, frames, seed=7)
        D = render_oracle(preset, w, h, frames, seed=8)
        rmse = float(np.sqrt(np.mean((C - A) ** 2)))  # equal-spp raw RMSE
        # Noise power of one render per side (independent-seed pairs).
        s_r2 = float(np.mean((A - B) ** 2)) / 2.0
        s_o2 = float(np.mean((C - D) ** 2)) / 2.0
        d2 = float(np.mean(((A + B) / 2 - (C + D) / 2) ** 2))
        bias2 = d2 - (s_r2 + s_o2) / 2.0
        bias = float(np.sqrt(max(bias2, 0.0)))
        scale = float(np.sqrt(np.mean(A ** 2)))
        results[preset] = {
            "rmse_hdr": round(rmse, 6),
            "noise_ref": round(float(np.sqrt(s_r2)), 6),
            "noise_oracle": round(float(np.sqrt(s_o2)), 6),
            "bias_rmse": round(bias, 6),
            "rms_ref": round(scale, 6),
        }
        print(f"{preset:16s} rmse={rmse:.6f} noise_ref={np.sqrt(s_r2):.6f} "
              f"noise_orc={np.sqrt(s_o2):.6f} bias_rmse={bias:.6f} "
              f"(ref rms {scale:.4f})", flush=True)
    print(json.dumps({"frames": frames, "resolution": f"{w}x{h}",
                      "results": results}))


if __name__ == "__main__":
    main()
