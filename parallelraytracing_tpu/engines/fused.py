"""Fused engine: the Pallas megakernel (whole bounce loop in VMEM).

The performance engine: unlike the jnp engines (whose per-bounce
intermediates round-trip HBM), one kernel invocation traces a ray tile
start-to-finish.  Two levers make the in-kernel hierarchy actually cull
(VERDICT round-1 items 2-3):

- acceleration structure: a threaded BVH over the Morton primitive
  clusters, walked in lockstep inside the kernel (pallas_trace tree_walk)
  — per-bounce cost ~O(visited nodes) instead of a linear scan of every
  cluster.  PRT_TRAVERSAL=linear reverts to the flat cluster scan for
  comparison.
- ray coherence: camera rays are permuted into Morton (Z-order) of their
  pixel coordinates before tracing, so each rows*128 kernel tile covers a
  compact screen block instead of a 2048-pixel scanline strip.  Coherent
  tiles enter fewer clusters AND die together (the kernel's whole-tile
  early-exit fires sooner).  PRT_MORTON=0 disables for comparison.

Uses interpret mode automatically off-TPU so it stays testable on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.config import RenderConfig
from parallelraytracing_tpu.engines.base import Renderer, register_engine
from parallelraytracing_tpu.engines.megakernel import raygen
from parallelraytracing_tpu.ops.pallas_trace import (LANES, pack_scene_tables,
                                                     pallas_trace)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of v over 32 (x -> 0x0x0x... interleave)."""
    v = v.astype(np.uint64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


@functools.lru_cache(maxsize=8)
def morton_pixel_perm(width: int, height: int):
    """(perm, inv) int32 arrays mapping scanline pixel order <-> Morton
    (Z-order) pixel order: perm[i] = pixel id at sorted position i,
    inv[p] = sorted position of pixel p.  Host-side, cached per
    resolution (static camera-independent layout)."""
    xx = _part1by1(np.arange(width, dtype=np.uint64))
    yy = _part1by1(np.arange(height, dtype=np.uint64)) << np.uint64(1)
    code = (yy[:, None] | xx[None, :]).reshape(-1)
    perm = np.argsort(code, kind="stable").astype(np.int32)
    inv = np.argsort(perm, kind="stable").astype(np.int32)
    return perm, inv


@register_engine
class FusedRenderer(Renderer):
    name = "fused"

    #: rows per tile: tile = rows*128 rays; 24 measured best after the
    #: compressed fold cheapened per-primitive tests (RESULTS.md)
    rows: int = int(os.environ.get("PRT_ROWS", "24"))

    #: in-kernel sub-tile rows: each tile splits into independent
    #: (sub_rows, 128) blocks with their own bounce loop / tree walks /
    #: early exit — finer-grained cluster entry for divergent rays
    #: without grid-level per-tile overhead.  0 = off.
    sub_rows: int = int(os.environ.get("PRT_SUBROWS", "0"))

    #: per-kind primitive count above which the table moves from SMEM
    #: scalar layout to VMEM row layout (dynamic-sublane reads).
    vmem_threshold: int = 2048

    #: in-kernel culling structure: "auto" (per-kind by cluster count),
    #: "tree" (threaded cluster-BVH walk) or "linear" (flat cluster scan).
    accel: str = os.environ.get("PRT_TRAVERSAL", "auto")

    #: Morton-order camera rays so kernel tiles are screen-space blocks.
    morton_rays: bool = os.environ.get("PRT_MORTON", "1") != "0"

    #: order linear-scan clusters nearest-the-eye first (ordered culling);
    #: tables repack on set_camera.
    front_to_back: bool = os.environ.get("PRT_F2B", "1") != "0"

    def set_camera(self, camera) -> None:
        super().set_camera(camera)
        if self.front_to_back and hasattr(self, "_mats"):
            self._pack_tables()  # cluster order is camera-dependent

    def _post_init(self) -> None:
        self._pack_tables()
        self._interpret = not _on_tpu()
        cfg = self.config
        if self.morton_rays:
            perm, inv = morton_pixel_perm(cfg.width, cfg.height)
            self._perm = jax.device_put(jnp.asarray(perm))
            self._inv = jax.device_put(jnp.asarray(inv))
        else:
            self._perm = self._inv = None

    def _pack_tables(self) -> None:
        from parallelraytracing_tpu.ops.nee import extract_lights
        from parallelraytracing_tpu.ops.pallas_trace import (
            pack_instance_tables, pack_lights_table, plan_table,
            to_vmem_rows)
        eye = self._camera.position if self.front_to_back else None
        if getattr(self._scene, "instances", None):
            # In-kernel TLAS/BLAS: trace instances natively instead of
            # rendering the baked copy — geometry memory ∝ unique meshes.
            base = self._scene.build(bake_instances=False)
            self._scene_data = jax.device_put(base)
            host_scene = jax.device_get(base)
            ord_base = float(host_scene.sph_valid.shape[0]
                             + host_scene.quad_valid.shape[0]
                             + host_scene.tri_valid.shape[0])
            itri, iacc, ibox, inst = pack_instance_tables(
                self._scene._inst_meshes, self._scene.instances, ord_base,
                ordered=(self.accel == "ordered"))
        else:
            host_scene = jax.device_get(self._scene_data)
            itri = None
        sph, quad, tri, sph_cl, quad_cl, tri_cl, mats = pack_scene_tables(
            host_scene, accel=self.accel, eye=eye)
        self._nee = bool(self.config.nee
                         and extract_lights(host_scene) is not None)
        lights = pack_lights_table(host_scene)
        self._lights_tab = jax.device_put(jnp.asarray(lights))
        self._sph_cl = jax.device_put(jnp.asarray(sph_cl))
        self._quad_cl = jax.device_put(jnp.asarray(quad_cl))
        self._tri_cl = jax.device_put(jnp.asarray(tri_cl))
        self._mats = jax.device_put(jnp.asarray(mats))
        tabs = []
        kinds = []
        for tab in (sph, quad):
            vm = tab.shape[1] > self.vmem_threshold
            kinds.append(vm)
            tabs.append(jax.device_put(jnp.asarray(
                to_vmem_rows(tab) if vm else tab)))
        self._sph_tab, self._quad_tab = tabs

        # SMEM already committed to the always-scalar tables; the
        # triangle tables get whatever fits (hot/cold split when the
        # full table would not — plan_table docstring).
        from parallelraytracing_tpu.ops.pallas_trace import \
            smem_padded_bytes

        def smem_sz(a, vm=False):
            if a is None or vm:
                return 0
            return smem_padded_bytes(np.asarray(a).shape)

        other = sum(smem_sz(a) for a in (sph_cl, quad_cl, tri_cl, mats,
                                         lights)) \
            + smem_sz(sph, kinds[0]) + smem_sz(quad, kinds[1])
        if itri is not None:
            other += sum(smem_padded_bytes(a.shape)
                         for a in (iacc, ibox, inst))
        tri_tab, tri_cold, tri_vm, _ = plan_table(
            tri, 16, other, self.vmem_threshold)
        self._tri_tab = jax.device_put(jnp.asarray(tri_tab))
        self._tri_cold = (None if tri_cold is None
                          else jax.device_put(jnp.asarray(tri_cold)))
        self._vmem_kinds = (kinds[0], kinds[1], tri_vm)

        if itri is not None:
            other += smem_sz(tri_tab, tri_vm)
            itri_tab, itri_cold, self._itri_vmem, _ = plan_table(
                itri, 16, other, self.vmem_threshold)
            self._itri_cold = (None if itri_cold is None
                               else jax.device_put(jnp.asarray(itri_cold)))
            self._inst = tuple(jax.device_put(jnp.asarray(a))
                               for a in (itri_tab, iacc, ibox, inst))
        else:
            self._inst = None
            self._itri_vmem = False
            self._itri_cold = None

    def render_sample_buffer(self, frame_index: int) -> jax.Array:
        cfg = self.config
        base = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), jnp.uint32(frame_index))
        tile = self.rows * LANES
        r = cfg.pixel_count
        pad = (-r) % tile
        sky = (float(np.asarray(self._scene_data.sky)[0]),
               float(np.asarray(self._scene_data.sky)[1]),
               float(np.asarray(self._scene_data.sky)[2]))

        acc = None
        for s in range(cfg.samples_per_frame):
            skey = jax.random.fold_in(base, jnp.uint32(s))
            k_jit, k_path = jax.random.split(skey)
            o, d = raygen(self._cam_params, k_jit, cfg.width, cfg.height,
                          cfg.jitter)
            if self._perm is not None:
                o = jnp.take(o, self._perm, axis=0)
                d = jnp.take(d, self._perm, axis=0)
                pix = self._perm.astype(jnp.float32)
            else:
                pix = jnp.arange(r, dtype=jnp.float32)
            if pad:
                o = jnp.pad(o, ((0, pad), (0, 0)))
                d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
                pix = jnp.pad(pix, (0, pad))
            seed = jnp.asarray(
                [jax.random.randint(k_path, (), 0, 2**31 - 1, jnp.int32)],
                jnp.int32)
            rad = pallas_trace(o, d, pix, self._sph_tab, self._quad_tab,
                               self._tri_tab, self._sph_cl, self._quad_cl,
                               self._tri_cl, self._mats, self._lights_tab,
                               seed, self.rows,
                               cfg.max_depth, cfg.t_min, cfg.t_max, sky,
                               interpret=self._interpret,
                               rr_depth=cfg.russian_roulette_depth,
                               vmem_kinds=self._vmem_kinds,
                               nee=self._nee, inst=self._inst,
                               itri_vmem=self._itri_vmem,
                               sub_rows=self.sub_rows,
                               tri_cold=self._tri_cold,
                               itri_cold=self._itri_cold)[:r]
            if self._inv is not None:
                rad = jnp.take(rad, self._inv, axis=0)
            acc = rad if acc is None else acc + rad
        return acc / cfg.samples_per_frame
