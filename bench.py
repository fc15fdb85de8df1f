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


def _compact_summary(rec: dict) -> dict:
    """One-line tail summary (VERDICT r4 item 4): the driver keeps only a
    2,000-char tail of bench stdout, and round 4's full record grew past
    it — losing the headline.  The LAST stdout line is therefore this
    compact record: headline + vs_baseline + fidelity verdict + the key
    workload numbers, guaranteed to fit the tail capture."""
    detail = rec.get("detail", {})
    fid = detail.get("fidelity", {})
    wl = detail.get("workloads", {})
    out = {
        "metric": rec.get("metric", "Mrays_per_sec_per_chip"),
        "value": rec.get("value", 0.0),
        "unit": rec.get("unit", "Mrays/s"),
        "vs_baseline": rec.get("vs_baseline", 0.0),
        "detail": {
            "engine": detail.get("engine"),
            "fidelity_pass": fid.get("pass") if fid else None,
            "workloads_mrays": {
                tag: w.get("mrays") for tag, w in wl.items()
                if isinstance(w, dict) and "mrays" in w
            },
        },
    }
    util = detail.get("utilization", {})
    if "projected_full_v5e_mrays" in util:
        out["detail"]["projected_full_v5e_mrays"] = \
            util["projected_full_v5e_mrays"]
    if "error" in detail:
        out["detail"]["error"] = str(detail["error"])[:200]
    return out


def main() -> None:
    # The remote compile service occasionally hangs for tens of minutes;
    # emit an honest failure record instead of hanging the harness.  If
    # the headline already measured before the alarm (a cold cache can
    # spend the whole budget compiling the mesh workloads), report THAT
    # with a timeout note rather than a zero.
    import signal

    best_so_far: dict = {}

    def _timeout(signum, frame):
        if best_so_far:
            rec = dict(best_so_far)
            rec.setdefault("detail", {})["error"] = \
                "bench timed out during later workloads (TPU compile service)"
            print(json.dumps(rec))
            print(json.dumps(_compact_summary(rec)))
        else:
            print(json.dumps({
                "metric": "Mrays_per_sec_per_chip", "value": 0.0,
                "unit": "Mrays/s", "vs_baseline": 0.0,
                "detail": {
                    "error": "bench timed out before any measurement "
                             "(TPU backend unavailable / compile service "
                             "outage) — NOT a code regression",
                    "last_measured_on_this_rig": {
                        "value": 25.48, "unit": "Mrays/s",
                        "where": "benchmarks/RESULTS.md (round 3 headline, "
                                 "2026-08-17, same defaults)",
                    },
                },
            }))
        sys.stdout.flush()
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    # 4200 s: the full row set (incl. the 1.28M-triangle stream row's
    # ~150 s host pack) measured ~2800 s cold on this rig; the
    # persistent compile cache cuts repeat runs well under that.
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT_S", "4200")))

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

    def exact_pallas_ray_count(r, cfg, n_frames=3) -> float:
        """Average EXACT rays/frame: steps the same pixel-keyed PCG
        streams the fused/wavefront_fused engines trace (same per-frame
        seed chain), via single-bounce Pallas segments."""
        import jax.numpy as jnp

        from parallelraytracing_tpu.engines.wavefront_fused import \
            count_frame_rays
        from parallelraytracing_tpu.ops.rays import (
            frame_stream_seeds, generate_camera_rays_ids)

        # count_frame_rays traces through pallas_segment, whose 14 ray
        # planes cannot afford the fused engine's hot/cold triangle
        # split (scoped-VMEM OOM at dragon scale — plan_table doc).  If
        # the measured engine carries split tables, rebuild a merged
        # segment-safe set just for counting: the count only depends on
        # the PCG streams, not the table layout.
        tables = r._tables
        if tables.tri_cold is not None or tables.itri_cold is not None:
            from parallelraytracing_tpu.engines.tables import \
                build_scene_tables
            eye = (r._camera.position
                   if getattr(r, "front_to_back", False) else None)
            tables, _ = build_scene_tables(
                r._scene, cfg, accel=getattr(r, "accel", "auto"),
                vmem_threshold=getattr(r, "vmem_threshold", 2048),
                eye=eye, allow_partial=False)

        total = 0
        ids = jnp.arange(cfg.pixel_count, dtype=jnp.int32)
        for f in range(n_frames):
            base = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed), jnp.uint32(f))
            skey = jax.random.fold_in(base, jnp.uint32(0))
            # the engines' exact streams: pixel-keyed jitter + frame seed
            # (order-invariant, so scanline ids replay Morton traces)
            jseed, s0 = frame_stream_seeds(skey)
            o, d = generate_camera_rays_ids(
                r._cam_params, cfg.width, cfg.height, ids, None,
                cfg.jitter, pix_seed=jseed)
            pix = ids.astype(jnp.float32)
            seed = s0[None]
            total += int(count_frame_rays(
                tables, o, d, pix, seed, r.rows, cfg, r._interpret))
        return total / n_frames

    def measure(scene, cam, cfg, prefs, n_frames):
        """Init the first engine in prefs that compiles, then measure
        steady-state ms/frame and the exact rays/frame numerator."""
        engine = r = film = None
        last_err = None
        for name in prefs:
            try:
                film = Film(cfg.width, cfg.height)
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
                print(f"# engine {name} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
        if engine is None:
            raise last_err

        # Rays/frame numerator: exact (same PCG streams as the engine)
        # for the Pallas engines, jnp-threefry estimate otherwise.
        if hasattr(r, "_tables"):
            rays_per_frame = exact_pallas_ray_count(r, cfg)
            count_method = "exact_pallas_pcg"
        else:
            rays_per_frame = count_bounce_rays(
                r._scene_data, r._cam_params, jax.random.PRNGKey(123), cfg)
            count_method = "jnp_threefry_estimate"

        t0 = time.time()
        for _ in range(n_frames):
            r.progressive_render()
        device_sync(film.accum)
        dt = (time.time() - t0) / n_frames
        return engine, {
            "mrays": round(rays_per_frame / dt / 1e6, 3),
            "rays_per_frame": int(rays_per_frame),
            "ms_per_frame": round(dt * 1000.0, 2),
            # 1 spp per progressive frame at this resolution, so
            # spp/sec = frames/sec (a BASELINE.md reporting metric).
            "spp_per_sec": round(1.0 / dt, 3),
            "ray_count_method": count_method,
        }

    results = {}
    engine = None
    for cam_name, cam in cameras.items():
        engine, results[cam_name] = measure(scene, cam, cfg, engine_prefs,
                                            frames)
        if cam_name == "reference_default":
            hl = results[cam_name]["mrays"]
            best_so_far.update({
                "metric": "Mrays_per_sec_per_chip",
                "value": round(hl, 3), "unit": "Mrays/s",
                "vs_baseline": round(hl / 200.0, 4),
                "detail": {"engine": engine, "views": dict(results)},
            })

    # ---- hardware-normalized utilization (VERDICT r3 item 7): measure
    # this tile's VMEM-resident VPU f32 ceiling (benchmarks/micro.py
    # roofline — the fused kernel was shown to issue vector work AT this
    # ceiling, RESULTS.md "The roofline") and report the headline both as
    # a fraction of full-spec v5e VPU rate and projected onto it, so the
    # vs_baseline number is interpretable without reading STATUS.md.
    utilization = {}
    if best_so_far:
        best_so_far["detail"]["utilization"] = utilization
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from benchmarks.micro import vpu_peak_vmem
        dt_u, ops_u = vpu_peak_vmem(mix="slab")
        measured_tops = ops_u / dt_u / 1e12
        V5E_SPEC_VPU_TOPS = 3.95  # 8x128 lanes x 4 ALUs x ~0.96 GHz f32
        hl = results["reference_default"]["mrays"]
        utilization.update({
            "vpu_peak_tops_measured": round(measured_tops, 3),
            "vpu_peak_tops_v5e_spec": V5E_SPEC_VPU_TOPS,
            "tile_fraction_of_v5e_vpu": round(
                measured_tops / V5E_SPEC_VPU_TOPS, 3),
            # The kernel is VPU-issue-bound at ~100% of the measured
            # ceiling (RESULTS.md), so throughput scales ~linearly with
            # the VPU rate: the same kernel on full-spec v5e silicon.
            "projected_full_v5e_mrays": round(
                hl * V5E_SPEC_VPU_TOPS / measured_tops, 1),
            "note": "kernel measured AT this tile's VPU ceiling; "
                    "tunneled tile runs a fraction of v5e spec",
        })
    except Exception as e:
        utilization["error"] = f"{type(e).__name__}: {e}"

    # ---- mesh workloads (BASELINE.md milestones 2-5, machine-readable —
    # VERDICT r2 item 8): bunny through the in-kernel SAH BVH and the
    # multi-mesh instanced scene through the in-kernel TLAS/BLAS.
    workloads = {}
    if best_so_far:  # live reference: timeouts keep completed workloads
        best_so_far["detail"]["workloads"] = workloads
    if os.environ.get("BENCH_WORKLOADS", "all") != "headline":
        from parallelraytracing_tpu.core.mesh import load_ply

        def mesh_scene(name):
            def build():
                # ONE recipe with cli/viewer --ply (core/scene.py)
                from parallelraytracing_tpu.core.scene import \
                    ply_showcase_scene
                s, _, _ = ply_showcase_scene(
                    f"/root/reference/assets/models/{name}.ply")
                return s
            return build

        bunny_scene = mesh_scene("bunny")
        dragon_scene = mesh_scene("dragon")

        def big_mesh_scene(level=2):
            # Subdivided dragon (midpoint subdivision of the bundled 20k
            # scan — identical surface): level 2 = 320k triangles (the
            # round-over-round comparable row), level 3 = 1.28M — BEYOND
            # the canonical 871k-triangle dragon scan, the scale the
            # reference's OptiX GAS ingests through optixAccelBuild
            # (optix/renderer.cpp:703-765).  Exercises the STREAMED
            # big-mesh path: HBM-resident per-chunk blocks with in-block
            # mini-trees, SMEM scratch + residency cache + DMA pipeline
            # (ops/pallas_trace STREAM_*).
            from parallelraytracing_tpu.core.mesh import subdivide
            mesh = subdivide(
                load_ply("/root/reference/assets/models/dragon.ply"),
                level)
            s = Scene(preset=None)
            mat = s.add_lambertian((0.75, 0.65, 0.5))
            s.add_mesh(mesh, mat, ((8, 8, 8), (0, 180, 0), (0, 8, 0)))
            ground = s.add_lambertian((0.5, 0.5, 0.5))
            s.add_quad(100, 100, ground, None)
            light = s.add_emissive((12, 12, 12))
            s.add_sphere(3.0, light, ((1, 1, 1), (0, 0, 0), (12, 25, 12)))
            return s

        def multimesh_scene():
            ico = load_ply("/root/reference/assets/models/icosahedron.ply")
            bun = load_ply("/root/reference/assets/models/bunny.ply")
            s = Scene(preset=None)
            body = s.add_lambertian((0.7, 0.6, 0.45))
            s.add_mesh_instances(
                bun, body, [((6, 6, 6), (0, 160, 0), (0, 6, 0)),
                            ((3, 3, 3), (0, 40, 0), (-12, 3, 6))])
            glass = s.add_dielectric(1.5)
            red = s.add_lambertian((0.8, 0.15, 0.1))
            s.add_mesh_instances(
                ico, glass, [((2.5,) * 3, (0, 30 * i, 0),
                              (9 + 2.5 * i, 2.5, 8 - 3.0 * i))
                             for i in range(3)])
            s.add_mesh_instances(
                ico, red, [((2,) * 3, (0, 15, 25), (-9, 2, 12)),
                           ((1.5,) * 3, (30, 0, 0), (4, 1.5, 14))])
            ground = s.add_lambertian((0.5, 0.5, 0.52))
            s.add_quad(120, 120, ground, None)
            light = s.add_emissive((11, 11, 10))
            s.add_sphere(3.5, light, ((1, 1, 1), (0, 0, 0), (14, 26, 14)))
            return s

        mesh_cfg = RenderConfig(width=width, height=height,
                                max_depth=depth, seed=0)
        bunny_cam = Camera(np.array([0.0, 14.0, 28.0]),
                           np.array([0.0, -7.0, -28.0]),
                           float(width), float(height), 100.0)
        mm_w, mm_h = width // 2, height // 2
        mm_cfg = RenderConfig(width=mm_w, height=mm_h,
                              max_depth=min(8, depth), seed=0)
        mm_cam = Camera(np.array([0.0, 12.0, 30.0]),
                        np.array([0.0, -7.0, -30.0]),
                        float(mm_w), float(mm_h), 100.0)
        # Full-spec multimesh config (BASELINE milestone 4: multi-mesh
        # TLAS/BLAS at 1080p@64spp — VERDICT r3 item 5); the half-res row
        # stays for round-over-round comparability.
        mmf_cfg = RenderConfig(width=width, height=height,
                               max_depth=min(8, depth), seed=0)
        mmf_cam = Camera(np.array([0.0, 12.0, 30.0]),
                         np.array([0.0, -7.0, -30.0]),
                         float(width), float(height), 100.0)
        # Russian-roulette rows (VERDICT r3 item 1: RR-on for mesh
        # workloads, measured in the record): unbiased stochastic
        # termination of the divergent deep-bounce tail; equal-TIME
        # quality beats rr=0 (RESULTS.md round-4 variance A/B), so these
        # are the recommended production settings.  The rr0 rows stay as
        # the round-over-round comparable fidelity default.
        rr_cfg = mesh_cfg.replace(russian_roulette_depth=2)
        mesh_frames = max(2, frames // 2)
        for tag, (sc, cam2, cfg2, prefs) in {
            "bunny_sah_1080p_d20": (bunny_scene, bunny_cam, mesh_cfg,
                                    ["wavefront_fused", "fused", "bvh"]),
            "bunny_sah_1080p_d20_rr2": (bunny_scene, bunny_cam, rr_cfg,
                                        ["wavefront_fused"]),
            "dragon_sah_1080p_d20": (dragon_scene, bunny_cam, mesh_cfg,
                                     ["wavefront_fused", "fused", "bvh"]),
            "dragon_sah_1080p_d20_rr2": (dragon_scene, bunny_cam, rr_cfg,
                                         ["wavefront_fused"]),
            "multimesh_tlas_halfres_d8": (multimesh_scene, mm_cam, mm_cfg,
                                          ["wavefront_fused", "tlas",
                                           "fused"]),
            "multimesh_tlas_1080p_64spp": (multimesh_scene, mmf_cam,
                                           mmf_cfg,
                                           ["wavefront_fused", "fused"]),
            # LAST (largest compiles): the streamed big-mesh rows
            "big_mesh_320k_stream_halfres_d8": (
                big_mesh_scene,
                Camera(np.array([0.0, 14.0, 28.0]),
                       np.array([0.0, -7.0, -28.0]),
                       float(mm_w), float(mm_h), 100.0),
                mm_cfg, ["wavefront_fused"]),
            # canonical-scale mesh (VERDICT r4 item 1): 1.28M triangles
            # — beyond the full-resolution 871k dragon scan
            "big_mesh_1280k_stream_halfres_d8": (
                lambda: big_mesh_scene(3),
                Camera(np.array([0.0, 14.0, 28.0]),
                       np.array([0.0, -7.0, -28.0]),
                       float(mm_w), float(mm_h), 100.0),
                mm_cfg, ["wavefront_fused"]),
        }.items():
            try:
                eng2, res2 = measure(sc(), cam2, cfg2, prefs, mesh_frames)
                res2["engine"] = eng2
                res2["resolution"] = f"{cfg2.width}x{cfg2.height}"
                res2["max_depth"] = cfg2.max_depth
                if cfg2.russian_roulette_depth:
                    res2["russian_roulette_depth"] = \
                        cfg2.russian_roulette_depth
                if tag == "multimesh_tlas_1080p_64spp":
                    # the milestone metric: wall seconds to accumulate
                    # the full 64-spp frame at 1080p
                    res2["spp64_wall_s"] = round(
                        64.0 * res2["ms_per_frame"] / 1000.0, 2)
                workloads[tag] = res2
            except Exception as e:  # honest partial record
                workloads[tag] = {"error": f"{type(e).__name__}: {e}"}

    # ---- fidelity gate (BASELINE.md reporting metric: RMSE vs reference
    # at equal spp) — and it GATES (VERDICT r3 item 2): every entry
    # asserts RMSE < 1e-3; any breach sets fidelity["pass"] = false and
    # bench exits nonzero after printing the record.
    #
    # Three converged comparisons (all deterministic: fixed seed chains,
    # so pass/fail cannot flake):
    # - material_test (all four BSDFs, sphere+quad kinds) — fused AND
    #   wavefront_fused vs the megakernel oracle at 4096 spp.  The
    #   Pallas engines draw their own in-kernel PCG streams, so the
    #   residual is MC noise that must converge below the gate — the
    #   demonstration round 3 lacked.
    # - bunny through the in-kernel SAH tree (the path carrying the mesh
    #   benchmarks), sky-lit (low-variance so 4096 spp converges).
    # - icosahedron instances through the in-kernel TLAS/BLAS vs the
    #   oracle on the SAME geometry baked to world space.
    # Plus the equal-streams check: the jnp bvh engine draws the SAME
    # threefry streams as the oracle, so its 32-spp RMSE must be 0.0
    # (pure numerics, no MC term).
    fidelity = {}
    if best_so_far:
        best_so_far["detail"]["fidelity"] = fidelity
    if os.environ.get("BENCH_FIDELITY", "1") != "0":
        from parallelraytracing_tpu.core.mesh import load_ply
        GATE = 1.0e-3
        fspp = int(os.environ.get("BENCH_FIDELITY_SPP", "4096"))
        fw, fh = 64, 48

        def frender(name, scene, cam, cfg, spp):
            film = Film(cfg.width, cfg.height)
            r = create_renderer(name)
            r.init(film, scene, cam, cfg)
            for _ in range(max(1, spp // cfg.samples_per_frame)):
                r.progressive_render()
            return np.asarray(film.hdr_average())

        def gate_entry(tag, img, ref, spp, **kw):
            rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
            fidelity[tag] = {"rmse_hdr_vs_oracle": round(rmse, 6),
                             "spp": spp, "pass": bool(rmse < GATE), **kw}

        def bunny_scene():
            bun = load_ply("/root/reference/assets/models/bunny.ply")
            s = Scene(preset=None)
            body = s.add_lambertian((0.7, 0.6, 0.45))
            s.add_mesh(bun, body, ((6, 6, 6), (0, 0, 0), (0, 0, 0)))
            ground = s.add_lambertian((0.5, 0.5, 0.52))
            s.add_quad(120, 120, ground, None)
            return s

        def ico_scene(baked):
            ico = load_ply("/root/reference/assets/models/icosahedron.ply")
            s = Scene(preset=None)
            red = s.add_lambertian((0.8, 0.15, 0.1))
            blue = s.add_lambertian((0.2, 0.3, 0.8))
            tfs = [(red, ((2.0,) * 3, (0, 30 * i, 0), (-4 + 4 * i, 2, 0)))
                   for i in range(3)]
            tfs.append((blue, ((1.5,) * 3, (0, 15, 25), (0, 2, 5))))
            for mid, tf in tfs:
                (s.add_mesh if baked else
                 lambda m, d, t: s.add_mesh_instances(m, d, [t]))(
                     ico, mid, tf)
            ground = s.add_lambertian((0.5, 0.5, 0.52))
            s.add_quad(60, 60, ground, None)
            return s

        try:
            fcfg = RenderConfig(width=fw, height=fh, max_depth=10, seed=0,
                                samples_per_frame=32)
            fcam = Camera(np.array([5.0, 5.0, 8.0]),
                          np.array([-5.0, -5.0, -8.0]),
                          float(fw), float(fh), 100.0)
            fscene = Scene(ScenePreset.MATERIAL_TEST)
            oracle = frender("megakernel", fscene, fcam, fcfg, fspp)
            for name in ("fused", "wavefront_fused"):
                img = frender(name, fscene, fcam, fcfg, fspp)
                gate_entry(name, img, oracle, fspp,
                           scene="material_test", equal_streams=False)
            # equal-streams numerics check (no MC term: must be ~0)
            spp32 = 32
            o32 = frender("megakernel", fscene, fcam,
                          fcfg.replace(samples_per_frame=1), spp32)
            b32 = frender("bvh", fscene, fcam,
                          fcfg.replace(samples_per_frame=1), spp32)
            gate_entry("bvh", b32, o32, spp32, scene="material_test",
                       equal_streams=True)

            mcam = Camera(np.array([0.0, 14.0, 28.0]),
                          np.array([0.0, -7.0, -28.0]),
                          float(fw), float(fh), 100.0)
            img = frender("wavefront_fused", bunny_scene(), mcam, fcfg,
                          fspp)
            ref = frender("megakernel", bunny_scene(), mcam, fcfg, fspp)
            gate_entry("bunny_sah", img, ref, fspp, scene="bunny_sky",
                       equal_streams=False)

            tcam = Camera(np.array([0.0, 6.0, 16.0]),
                          np.array([0.0, -4.0, -16.0]),
                          float(fw), float(fh), 100.0)
            # the instanced scene's variance is ~4x the bunny's (measured:
            # RMSE 9.6e-4 at 4096 spp — pass but thin); 2x spp buys a
            # ~1.4x margin under the gate
            tspp = 2 * fspp
            img = frender("wavefront_fused", ico_scene(False), tcam, fcfg,
                          tspp)
            ref = frender("megakernel", ico_scene(True), tcam, fcfg, tspp)
            gate_entry("tlas_blas", img, ref, tspp, scene="ico_instances",
                       equal_streams=False)

            # ---- streamed big-mesh vs dense: BIT-IDENTICAL on real
            # hardware, asserted EVERY bench run (VERDICT r4 item 7).
            # Small subdivided mesh with the stream machinery forced on
            # (module thresholds), vs the same scene through the dense
            # tables — same engine, same pixel-keyed streams: RMSE must
            # be exactly 0.0.
            import parallelraytracing_tpu.ops.pallas_trace as _pt
            from parallelraytracing_tpu.core.mesh import subdivide

            def stream_scene():
                ico2 = subdivide(load_ply(
                    "/root/reference/assets/models/icosahedron.ply"), 2)
                s = Scene(preset=None)
                red = s.add_lambertian((0.8, 0.2, 0.1))
                s.add_mesh(ico2, red, ((2.0,) * 3, (0, 20, 0), (0, 2, 0)))
                g = s.add_lambertian((0.5, 0.5, 0.55))
                s.add_quad(30, 30, g, None)
                li = s.add_emissive((9, 9, 8))
                s.add_sphere(2.0, li, ((1, 1, 1), (0, 0, 0), (6, 10, 6)))
                return s

            scam = Camera(np.array([0.0, 4.0, 10.0]),
                          np.array([0.0, -2.5, -10.0]),
                          float(fw), float(fh), 100.0)
            scfg = fcfg.replace(samples_per_frame=1)
            old_thr, old_chunk = _pt.STREAM_THRESHOLD, _pt.STREAM_CHUNK
            try:
                _pt.STREAM_THRESHOLD, _pt.STREAM_CHUNK = 64, 32
                s_img = frender("wavefront_fused", stream_scene(), scam,
                                scfg, 4)
            finally:
                _pt.STREAM_THRESHOLD, _pt.STREAM_CHUNK = old_thr, old_chunk
            d_img = frender("wavefront_fused", stream_scene(), scam,
                            scfg, 4)
            rmse_s = float(np.sqrt(np.mean((s_img - d_img) ** 2)))
            fidelity["stream_vs_dense"] = {
                "rmse_hdr_vs_oracle": round(rmse_s, 9), "spp": 4,
                "pass": bool(np.array_equal(s_img, d_img)),
                "scene": "ico_subdiv_320tri", "bit_identical_required": True}

            # ---- in-kernel image textures vs the jnp oracle (VERDICT r4
            # item 7): a sky-lit image-textured quad + triangle pair
            # (low variance), fused's packed-u24 lane-gather fetch vs the
            # megakernel's ops/textures sampler, converged under the gate.
            def tex_scene():
                yy, xx = np.mgrid[0:16, 0:16]
                img16 = np.stack([(xx % 8) / 7.0, (yy % 8) / 7.0,
                                  ((xx + yy) % 16) / 15.0], axis=-1)
                s = Scene(preset=None)
                tid = s.add_texture(img16)
                tm = s.add_textured_lambertian(tid)
                s.add_quad(6, 6, tm, ((1, 1, 1), (60, 0, 0), (0, 4, -4)))
                g = s.add_lambertian((0.5, 0.5, 0.52))
                s.add_quad(40, 40, g, None)
                return s

            xcam = Camera(np.array([0.0, 5.0, 10.0]),
                          np.array([0.0, -2.0, -10.0]),
                          float(fw), float(fh), 100.0)
            img = frender("fused", tex_scene(), xcam, fcfg, fspp)
            ref = frender("megakernel", tex_scene(), xcam, fcfg, fspp)
            gate_entry("textured_image", img, ref, fspp,
                       scene="textured_quad_sky", equal_streams=False)

            fidelity["pass"] = all(
                v.get("pass", True) for v in fidelity.values()
                if isinstance(v, dict))
        except Exception as e:
            fidelity["error"] = f"{type(e).__name__}: {e}"
            fidelity["pass"] = False

    mrays = results["reference_default"]["mrays"]
    record = {
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
            "workloads": workloads,
            "fidelity": fidelity,
            "utilization": utilization,
            "device": str(jax.devices()[0]),
        },
    }
    # Full record first, compact headline summary LAST (tail-capture-safe
    # — VERDICT r4 item 4; round 4's headline was lost to the 2,000-char
    # tail because the full record led with it).
    print(json.dumps(record))
    print(json.dumps(_compact_summary(record)))
    if fidelity and not fidelity.get("pass", True):
        # The fidelity gate GATES (VERDICT r3 item 2): a Pallas engine
        # drifting from the oracle beyond the BASELINE.md 1e-3 bar is a
        # regression, not a footnote.
        sys.exit(4)


if __name__ == "__main__":
    main()
