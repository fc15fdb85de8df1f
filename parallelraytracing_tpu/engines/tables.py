"""Shared scene-table packing for the Pallas (fused-kernel) engines.

Every Pallas-backed engine (fused, wavefront_fused, sharded) consumes the
same device-side scene representation: per-kind SoA primitive tables +
acceleration structures + compressed material table + lights + optional
instance (TLAS/BLAS) tables, with SMEM/VMEM placement planned against the
measured 1 MiB scalar-memory budget (ops/pallas_trace.plan_table).  The
reference does the equivalent once per backend with near-identical
pointer-remapping uploads (cuda_megakernel/renderer.cu:276-355,
cuda_wavefront/soa.cpp:37-114, optix/renderer.cpp:444-701); here the
packing lives in ONE place so the multi-chip engine is guaranteed the
same feature set (NEE, hot/cold split, instancing) as the single-chip
ones.

`PallasSceneTables` is a registered JAX dataclass: array leaves trace
through jit / shard_map (replicate with a single `P()` spec), while the
placement flags / sky / bbox ride as static metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.config import RenderConfig


@dataclasses.dataclass(frozen=True)
class PallasSceneTables:
    """Packed device tables + static placement metadata (see module doc)."""

    # --- traced array leaves
    sph: jax.Array
    quad: jax.Array
    tri: jax.Array
    sph_cl: jax.Array
    quad_cl: jax.Array
    tri_cl: jax.Array
    mats: jax.Array
    lights: jax.Array
    tri_cold: Optional[jax.Array]
    #: SMEM hot PREFIX for oversize triangle tables (plan_table large
    #: case — the dragon read-path fix); None otherwise
    tri_hot: Optional[jax.Array]
    #: (R,128) packed-u24 texel rows for in-kernel image textures
    #: (pallas_trace.pack_kernel_textures); None on non-image scenes
    itex_tab: Optional[jax.Array]
    inst: Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]
    itri_cold: Optional[jax.Array]

    # --- static metadata (jit-hashable; changes retrigger compilation)
    vmem_kinds: Tuple[bool, bool, bool]
    itri_vmem: bool
    nee: bool
    sky: Tuple[float, float, float]
    #: static scene bbox (lo, 1/extent) for origin-Morton quantization
    bb: Tuple[Tuple[float, float, float], Tuple[float, float, float]]
    #: per-kind fine-view roots for the straggler-tail walk
    #: (pallas_trace TAIL_CLUSTER; (-1,-1,-1) = single-view trees)
    tail_roots: Tuple[int, int, int] = (-1, -1, -1)
    #: True iff some table column order depends on the camera eye (a
    #: linear-scan kind took front-to-back ordering) — when False,
    #: camera moves never require a repack (SAH trees are static)
    eye_dependent: bool = False
    #: static checker-material list ((mat id, cell scale, odd rgb), ...)
    #: — Scene.add_checker; empty on untextured scenes so the kernels
    #: compile the texture path away entirely
    checker: Tuple = ()
    #: streamed big-mesh chunk size (0 = dense tables): triangles ride
    #: HBM as (rows, 128); chunk-aligned SAH leaves DMA into VMEM
    #: scratch on entry (pallas_trace STREAM_THRESHOLD/STREAM_CHUNK)
    tri_stream: int = 0
    #: triangles per 128-lane scratch row in the streamed layout (attrs
    #: at static lane offsets k*(128/pack)); 1 on dense tables
    tri_pack: int = 1
    #: mini-tree node rows per streamed chunk block (auto-picked with
    #: the chunk size against the SMEM budget); 0 on dense tables
    tri_snode: int = 0
    #: static in-kernel image-texture spec ((mat id, row off, th, tw),
    #: ...) — empty on non-image scenes (texture path compiled away)
    itex: Tuple = ()


jax.tree_util.register_dataclass(
    PallasSceneTables,
    data_fields=["sph", "quad", "tri", "sph_cl", "quad_cl", "tri_cl",
                 "mats", "lights", "tri_cold", "tri_hot", "itex_tab",
                 "inst", "itri_cold"],
    meta_fields=["vmem_kinds", "itri_vmem", "nee", "sky", "bb",
                 "tail_roots", "eye_dependent", "checker", "tri_stream",
                 "tri_pack", "tri_snode", "itex"],
)


def _sky_spec(host_scene):
    """The kernel's STATIC sky spec: a 3-tuple keeps the reference's
    constant-sky path byte-identical; scenes using Scene.set_sky extend
    it to a 13-tuple (bottom3, top3, sun_dir3, sun_color3, power) the
    miss block compiles directionally (ops/pallas_trace.py).  Reads the
    SceneData fields (already sky_light_intensity-scaled uniformly) so
    jnp engines and kernels agree."""
    bot = tuple(float(x) for x in np.asarray(host_scene.sky))
    top = host_scene.sky_top
    sun = host_scene.sun
    if top is None and sun is None:
        return bot
    top = bot if top is None else tuple(float(x) for x in np.asarray(top))
    if sun is None:
        sd, sc, p = (0.0, 1.0, 0.0), (0.0, 0.0, 0.0), 1
    else:
        sun = np.asarray(sun)
        sd = tuple(float(x) for x in sun[0:3])
        sc = tuple(float(x) for x in sun[3:6])
        p = int(sun[6])
    return bot + top + sd + sc + (p,)


def build_scene_tables(scene, config: RenderConfig, accel: str = "auto",
                       vmem_threshold: int = 2048, eye=None,
                       allow_partial: bool = True):
    """Pack a Scene for the Pallas kernels.

    Returns (PallasSceneTables, scene_data): scene_data is the SceneData
    the engine should keep (UNBAKED base when the scene has instances —
    the in-kernel TLAS traces them natively so geometry memory stays
    proportional to unique meshes, the reference's IAS-over-GAS property,
    optix/renderer.cpp:833-870).

    eye: optional camera position enabling nearest-first cluster order
    for linear-scan kinds (front-to-back culling; camera-dependent, so
    callers repack on camera move).

    allow_partial: pass False for engines that trace through
    pallas_segment (wavefront_fused) — the oversize-table hot/cold VMEM
    split + SMEM prefix only pays inside the fused bounce kernel, and
    the segment kernel's 14 ray planes push the two-table layout over
    the 16 MiB scoped-VMEM limit at dragon scale (plan_table doc)."""
    from parallelraytracing_tpu.accel.lbvh import scene_primitive_aabbs
    from parallelraytracing_tpu.ops.nee import extract_lights
    from parallelraytracing_tpu.ops.pallas_trace import (
        pack_instance_tables, pack_lights_table, pack_scene_tables,
        plan_table, smem_padded_bytes, to_vmem_rows)

    has_img = any(t >= 2 for t in getattr(scene, "_mat_tex", []))

    if getattr(scene, "instances", None):
        base = scene.build(bake_instances=False)
        scene_data = jax.device_put(base)
        host_scene = jax.device_get(base)
        ord_base = float(host_scene.sph_valid.shape[0]
                         + host_scene.quad_valid.shape[0]
                         + host_scene.tri_valid.shape[0])
        # with_uv: instanced image-textured materials read barycentric
        # texcoords from itri rows 25-30 (r5; was a jnp-only refusal)
        itri, iacc, ibox, inst = pack_instance_tables(
            scene._inst_meshes, scene.instances, ord_base,
            ordered=(accel == "ordered"), with_uv=has_img)
    else:
        scene_data = jax.device_put(scene.build())
        host_scene = jax.device_get(scene_data)
        itri = None

    (sph, quad, tri, sph_cl, quad_cl, tri_cl, mats,
     tail_roots, eye_used, tri_stream, tri_pack,
     tri_snode) = pack_scene_tables(
         host_scene, accel=accel, eye=eye)
    nee = bool(config.nee and extract_lights(host_scene) is not None)
    lights = pack_lights_table(host_scene)

    itex = ()
    itex_rows = None
    if has_img:
        # In-kernel image textures (bounded: quad/tri materials,
        # <= KTEX_MAX per axis) — raises NotImplementedError outside
        # the envelope so auto-routing falls back to the jnp engines.
        from parallelraytracing_tpu.ops.pallas_trace import \
            pack_kernel_textures
        itex, itex_rows = pack_kernel_textures(host_scene)

    tabs = []
    kinds = []
    for tab in (sph, quad):
        vm = tab.shape[1] > vmem_threshold
        kinds.append(vm)
        tabs.append(jax.device_put(jnp.asarray(
            to_vmem_rows(tab) if vm else tab)))
    sph_dev, quad_dev = tabs

    def smem_sz(a, vm=False):
        if a is None or vm:
            return 0
        return smem_padded_bytes(np.asarray(a).shape)

    # SMEM budget already committed to the always-scalar tables; the
    # triangle tables get whatever fits (hot/cold split when the full
    # table would not — plan_table docstring).
    other = sum(smem_sz(a) for a in (sph_cl, quad_cl, tri_cl, mats,
                                     lights)) \
        + smem_sz(sph, kinds[0]) + smem_sz(quad, kinds[1])
    if itri is not None:
        other += sum(smem_padded_bytes(a.shape)
                     for a in (iacc, ibox, inst))
    if tri_stream:
        # streamed big-mesh: pack_scene_tables already assembled the
        # per-chunk HBM blocks (triangle rows + in-block mini-tree,
        # _assemble_stream_blocks); the kernel DMAs whole blocks to
        # scratch on chunk entry
        tri_tab = tri
        tri_cold = tri_hot = None
        tri_vm = True
    else:
        tri_tab, tri_cold, tri_vm, _, tri_hot = plan_table(
            tri, 16, other, vmem_threshold, allow_partial=allow_partial)

    if itri is not None:
        if tri_hot is not None:
            other += smem_padded_bytes(tri_hot.shape)
        other += smem_sz(tri_tab, tri_vm)
        # allow_partial=False: the kernel has no itri SMEM-prefix
        # dispatch (pallas_trace takes tri_hot only), so the large-case
        # split would pay the two-table layout with none of the prefix
        # benefit — keep the merged VMEM table there instead.  The
        # mid-size hot-SMEM/cold-VMEM split is unaffected.
        itri_tab, itri_cold, itri_vm, _, _ = plan_table(
            itri, 16, other, vmem_threshold, allow_partial=False)
        inst_dev = tuple(jax.device_put(jnp.asarray(a))
                         for a in (itri_tab, iacc, ibox, inst))
        itri_cold_dev = (None if itri_cold is None
                         else jax.device_put(jnp.asarray(itri_cold)))
    else:
        inst_dev = None
        itri_vm = False
        itri_cold_dev = None

    # Static scene bbox (origin-Morton quantization frame): union of base
    # primitives and instance world boxes.
    mn, mx, _, _ = scene_primitive_aabbs(host_scene)
    mins = [mn] if len(mn) else []
    maxs = [mx] if len(mx) else []
    if itri is not None:
        mins.append(ibox[:3].T)
        maxs.append(ibox[3:].T)
    if mins:
        lo = np.concatenate(mins).min(0)
        ext = np.maximum(np.concatenate(maxs).max(0) - lo, 1e-9)
    else:
        lo = np.zeros(3)
        ext = np.ones(3)

    tables = PallasSceneTables(
        sph=sph_dev, quad=quad_dev,
        tri=jax.device_put(jnp.asarray(tri_tab)),
        sph_cl=jax.device_put(jnp.asarray(sph_cl)),
        quad_cl=jax.device_put(jnp.asarray(quad_cl)),
        tri_cl=jax.device_put(jnp.asarray(tri_cl)),
        mats=jax.device_put(jnp.asarray(mats)),
        lights=jax.device_put(jnp.asarray(lights)),
        tri_cold=(None if tri_cold is None
                  else jax.device_put(jnp.asarray(tri_cold))),
        tri_hot=(None if tri_hot is None
                 else jax.device_put(jnp.asarray(tri_hot))),
        itex_tab=(None if itex_rows is None
                  else jax.device_put(jnp.asarray(itex_rows))),
        inst=inst_dev,
        itri_cold=itri_cold_dev,
        vmem_kinds=(kinds[0], kinds[1], tri_vm),
        itri_vmem=itri_vm,
        nee=nee,
        sky=_sky_spec(host_scene),
        bb=(tuple(float(x) for x in lo),
            tuple(float(1.0 / x) for x in ext)),
        tail_roots=tuple(int(x) for x in tail_roots),
        eye_dependent=bool(eye_used),
        tri_stream=int(tri_stream),
        tri_pack=int(tri_pack),
        tri_snode=int(tri_snode),
        itex=tuple(itex),
        checker=tuple(
            (float(i), float(pr[0]), float(pr[1]), float(pr[2]),
             float(pr[3]))
            for i, (tx, pr) in enumerate(zip(
                getattr(scene, "_mat_tex", []),
                getattr(scene, "_mat_tex_param", [])))
            if tx == 1),
    )
    return tables, scene_data


def trace_tables(t: PallasSceneTables, o, d, pix, seed, rows: int,
                 cfg: RenderConfig, interpret: bool,
                 sub_rows: int = 0, collect_stats: bool = False,
                 depth_out: bool = False):
    """pallas_trace with every feature flag routed from the table struct —
    the single calling convention all fused-kernel engines share."""
    from parallelraytracing_tpu.ops.pallas_trace import pallas_trace
    return pallas_trace(
        o, d, pix, t.sph, t.quad, t.tri, t.sph_cl, t.quad_cl, t.tri_cl,
        t.mats, t.lights, seed, rows, cfg.max_depth, cfg.t_min, cfg.t_max,
        t.sky, interpret=interpret, rr_depth=cfg.russian_roulette_depth,
        vmem_kinds=t.vmem_kinds, nee=t.nee, inst=t.inst,
        itri_vmem=t.itri_vmem, sub_rows=sub_rows,
        collect_stats=collect_stats, tri_cold=t.tri_cold,
        itri_cold=t.itri_cold, tail_roots=t.tail_roots,
        tri_hot=t.tri_hot, checker=t.checker, depth_out=depth_out,
        tri_stream=t.tri_stream, tri_pack=t.tri_pack,
        tri_snode=t.tri_snode, itex=t.itex, itex_tab=t.itex_tab)
