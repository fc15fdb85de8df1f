"""Wavefront-fused engine: Pallas bounce SEGMENTS + ray re-sorting.

The TPU realization of the reference's wavefront architecture
(cuda_wavefront/renderer.cu:372-434) built on what this hardware actually
rewards.  The fused megakernel's whole-tile lockstep culling works only
while a tile's rays agree on where they're going: primary rays (Morton
pixel order) are coherent, but after one diffuse bounce a tile's rays fan
out over the whole scene and the any-lane-hit test degrades toward brute
force (measured 17x per-bounce cost jump on the bunny,
benchmarks/RESULTS.md).  So:

- trace `segment` bounces inside one Pallas kernel (VMEM-resident, no
  HBM between bounces — the fused engine's win);
- between segments, compact dead rays out AND re-sort the survivors by
  the Morton code of their current origin (one jnp argsort + plane
  gathers — the TPU analogue of the wavefront queues, with sorting as
  the divergence fix the reference lists as future work,
  wavefront.md:45-120);
- RNG is keyed on (pixel id, absolute depth) inside the kernel, so the
  re-sort provably cannot change the image (tested bit-exact vs the
  unsorted fused engine ordering in tests/test_wavefront_fused.py).

The radiance of finished rays is scatter-added straight into the
pixel-indexed frame between segments.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.config import RenderConfig
from parallelraytracing_tpu.engines.base import Renderer, register_engine
from parallelraytracing_tpu.engines.fused import morton_pixel_perm
from parallelraytracing_tpu.engines.megakernel import raygen
from parallelraytracing_tpu.ops.pallas_trace import (LANES,
                                                     pack_scene_tables,
                                                     pallas_segment)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _part1by2(v: jax.Array) -> jax.Array:
    """Spread 10 bits over 30 (jnp int32, in-jit)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.int32(0x030000FF)
    v = (v | (v << 8)) & jnp.int32(0x0300F00F)
    v = (v | (v << 4)) & jnp.int32(0x030C30C3)
    v = (v | (v << 2)) & jnp.int32(0x09249249)
    return v


def _origin_morton(ox, oy, oz, bb_lo, inv_ext):
    """30-bit Morton code of quantized ray origins (scene-bbox frame)."""
    def q(o, lo, ie):
        return jnp.clip((o - lo) * ie * 1024.0, 0.0, 1023.0).astype(jnp.int32)
    return (_part1by2(q(ox, bb_lo[0], inv_ext[0])) << 2) \
        | (_part1by2(q(oy, bb_lo[1], inv_ext[1])) << 1) \
        | _part1by2(q(oz, bb_lo[2], inv_ext[2]))


def _sort_key(state, bb_lo, inv_ext, mode: str):
    """Coherence key for the between-segment re-sort.

    "origin": 30-bit Morton of the ray origin (scene-bbox quantized).
    "octant": direction octant (3 bits) majoring over 27 origin-Morton
    bits — rays grouped by WHERE they are and WHICH WAY they point, the
    joint locality the whole-tile any-lane-hit test actually needs."""
    ox, oy, oz, dx, dy, dz = state[0], state[1], state[2], \
        state[3], state[4], state[5]
    m = _origin_morton(ox, oy, oz, bb_lo, inv_ext)
    if mode == "origin":
        return m
    oct_ = ((dx < 0).astype(jnp.int32) << 2) \
        | ((dy < 0).astype(jnp.int32) << 1) \
        | (dz < 0).astype(jnp.int32)
    return (oct_ << 27) | (m >> 3)


@partial(jax.jit,
         static_argnames=("rows", "segment", "max_depth", "t_min", "t_max",
                          "sky", "bb", "interpret", "rr_depth",
                          "vmem_kinds", "sort_rays", "nee", "itri_vmem"))
def segmented_trace(o, d, pix0, sph_tab, quad_tab, tri_tab,
                    sph_cl, quad_cl, tri_cl, mats, lights, seed,
                    rows: int, segment: int, max_depth: int,
                    t_min: float, t_max: float, sky, bb,
                    interpret: bool = False, rr_depth: int = 0,
                    vmem_kinds=(False, False, False),
                    sort_rays: str = "octant", nee: bool = False,
                    inst=None, itri_vmem: bool = False,
                    tri_cold=None, itri_cold=None):
    """Returns (R,3) radiance for camera rays (o, d), indexed by the
    original pixel ids pix0 (f32 (R,) — rays may arrive in any order,
    e.g. Morton pixel order).

    bb = ((lox,loy,loz),(ix,iy,iz)) static scene bbox lo / inverse extent
    for the origin quantization."""
    r = o.shape[0]
    tile = rows * LANES
    pad = (-r) % tile
    rp = r + pad

    def padp(x, c=0.0):
        return jnp.pad(x, (0, pad), constant_values=c) if pad else x

    pix = padp(pix0, float(rp))  # pad slots scatter to the drop row
    state = [padp(o[:, 0]), padp(o[:, 1]), padp(o[:, 2]),
             padp(d[:, 0]), padp(d[:, 1]), padp(d[:, 2], 1.0),
             jnp.ones(rp), jnp.ones(rp), jnp.ones(rp),      # throughput
             jnp.zeros(rp), jnp.zeros(rp), jnp.zeros(rp)]   # radiance
    alive_p = jnp.ones(rp)  # carries the NEE no-emit flag across segments
    count = jnp.int32(r)
    bb_lo, inv_ext = bb

    n_segs = -(-max_depth // segment)
    for s in range(n_segs):
        n_bounces = min(segment, max_depth - s * segment)
        scalars = jnp.stack([seed[0], jnp.int32(s * segment),
                             count]).astype(jnp.int32)
        state, alive = pallas_segment(
            pix, (*state, alive_p), sph_tab, quad_tab, tri_tab,
            sph_cl, quad_cl, tri_cl, mats, lights, scalars,
            rows, n_bounces, t_min, t_max, sky, interpret, rr_depth,
            vmem_kinds, nee, inst, itri_vmem, tri_cold, itri_cold)
        state = list(state)
        alive_p = alive

        if s + 1 < n_segs:
            # Compact + coherence-sort in ONE argsort: dead rays key to
            # +inf, survivors order by origin Morton code.  Radiance rides
            # the state, so the permutation costs exactly ONE stacked
            # row-gather (13 x 4B rows) — per-plane gathers were measured
            # 10x slower (benchmarks/RESULTS.md).
            alive_b = alive > 0.0
            if sort_rays:
                key = _sort_key(state, bb_lo, inv_ext, sort_rays)
            else:
                key = jnp.arange(rp, dtype=jnp.int32)
            key = jnp.where(alive_b, key, jnp.int32(2**30))
            order = jnp.argsort(key)
            count = jnp.sum(alive_b.astype(jnp.int32))
            mat = jnp.stack([pix, *state, alive_p], axis=1)
            mat = jnp.take(mat, order, axis=0)
            pix = mat[:, 0]
            state = [mat[:, i + 1] for i in range(12)]
            alive_p = mat[:, 13]

    # One end-of-frame scatter puts radiance back in pixel order.
    rad = jnp.zeros((rp + 1, 3), jnp.float32)  # slot rp = dropped pad
    pidx = jnp.minimum(pix.astype(jnp.int32), rp)
    rad = rad.at[pidx].add(jnp.stack(state[9:12], axis=1), mode="drop")
    return rad[:r]


@partial(jax.jit,
         static_argnames=("rows", "max_depth", "t_min", "t_max",
                          "sky", "interpret", "rr_depth", "vmem_kinds",
                          "nee"))
def count_frame_rays(o, d, pix0, sph_tab, quad_tab, tri_tab,
                     sph_cl, quad_cl, tri_cl, mats, lights, seed,
                     rows: int, max_depth: int,
                     t_min: float, t_max: float, sky,
                     interpret: bool = False, rr_depth: int = 0,
                     vmem_kinds=(False, False, False),
                     nee: bool = False, tri_cold=None) -> jax.Array:
    """EXACT ray count of one frame: camera rays + rays alive entering
    every later bounce, measured by stepping the SAME pixel-keyed PCG
    streams the Pallas engines trace (single-bounce segments, no
    reordering).  This is the honest numerator for Mrays/s — the jnp
    counter draws a different (threefry) stream and under/over-counts by
    the stream difference."""
    r = o.shape[0]
    tile = rows * LANES
    pad = (-r) % tile
    rp = r + pad

    def padp(x, c=0.0):
        return jnp.pad(x, (0, pad), constant_values=c) if pad else x

    pix = padp(pix0, float(rp))
    state = [padp(o[:, 0]), padp(o[:, 1]), padp(o[:, 2]),
             padp(d[:, 0]), padp(d[:, 1]), padp(d[:, 2], 1.0),
             jnp.ones(rp), jnp.ones(rp), jnp.ones(rp),
             jnp.zeros(rp), jnp.zeros(rp), jnp.zeros(rp)]
    alive_p = jnp.ones(rp)
    count = jnp.int32(r)
    total = jnp.int32(0)
    for depth in range(max_depth):
        total = total + count
        scalars = jnp.stack([seed[0], jnp.int32(depth),
                             count]).astype(jnp.int32)
        state, alive = pallas_segment(
            pix, (*state, alive_p), sph_tab, quad_tab, tri_tab,
            sph_cl, quad_cl, tri_cl, mats, lights, scalars,
            rows, 1, t_min, t_max, sky, interpret, rr_depth, vmem_kinds,
            nee, tri_cold=tri_cold)
        state = list(state)
        alive_p = alive
        # Compact survivors to the front (in_q masks the first `count`
        # slots); order-stable, and RNG is pixel-keyed so the permutation
        # cannot change the streams.
        alive_b = alive > 0.0
        key = jnp.where(alive_b, jnp.arange(rp, dtype=jnp.int32),
                        jnp.int32(2**30))
        order = jnp.argsort(key)
        count = jnp.sum(alive_b.astype(jnp.int32))
        mat = jnp.stack([pix, *state, alive_p], axis=1)
        mat = jnp.take(mat, order, axis=0)
        pix = mat[:, 0]
        state = [mat[:, i + 1] for i in range(12)]
        alive_p = mat[:, 13]
    return total


@register_engine
class WavefrontFusedRenderer(Renderer):
    name = "wavefront_fused"

    rows: int = int(os.environ.get("PRT_ROWS", "24"))

    #: bounces per Pallas kernel invocation between compaction/sorts.
    segment: int = int(os.environ.get("PRT_SEGMENT", "3"))

    #: between-segment re-sort key: "octant" (direction octant major,
    #: origin Morton minor — the default), "origin", or "" (compact only).
    sort_rays: str = {"0": "", "none": "", "1": "octant"}.get(
        os.environ.get("PRT_SORT", "octant"),
        os.environ.get("PRT_SORT", "octant"))

    accel: str = os.environ.get("PRT_TRAVERSAL", "auto")
    vmem_threshold: int = 2048

    def _post_init(self) -> None:
        from parallelraytracing_tpu.accel.lbvh import scene_primitive_aabbs
        from parallelraytracing_tpu.ops.pallas_trace import to_vmem_rows
        from parallelraytracing_tpu.ops.nee import extract_lights
        from parallelraytracing_tpu.ops.pallas_trace import (
            pack_instance_tables, pack_lights_table, to_vmem_rows)
        from parallelraytracing_tpu.ops.pallas_trace import plan_table
        if getattr(self._scene, "instances", None):
            # In-kernel TLAS/BLAS (same path as the fused engine).
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
            host_scene, accel=self.accel)
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
        self._interpret = not _on_tpu()
        cfg = self.config
        perm, inv = morton_pixel_perm(cfg.width, cfg.height)
        self._perm = jax.device_put(jnp.asarray(perm))
        # Static scene bbox for origin quantization (union of base
        # primitives and instance world boxes).
        mn, mx, _, _ = scene_primitive_aabbs(host_scene)
        mins = [mn] if len(mn) else []
        maxs = [mx] if len(mx) else []
        if self._inst is not None:
            ibox = np.asarray(self._inst[2])
            mins.append(ibox[:3].T)
            maxs.append(ibox[3:].T)
        if mins:
            lo = np.concatenate(mins).min(0)
            ext = np.maximum(np.concatenate(maxs).max(0) - lo, 1e-9)
        else:
            lo = np.zeros(3)
            ext = np.ones(3)
        self._bb = (tuple(float(x) for x in lo),
                    tuple(float(1.0 / x) for x in ext))

    def render_sample_buffer(self, frame_index: int) -> jax.Array:
        cfg = self.config
        base = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), jnp.uint32(frame_index))
        sky = tuple(float(x) for x in np.asarray(self._scene_data.sky))
        acc = None
        for s in range(cfg.samples_per_frame):
            skey = jax.random.fold_in(base, jnp.uint32(s))
            k_jit, k_path = jax.random.split(skey)
            o, d = raygen(self._cam_params, k_jit, cfg.width, cfg.height,
                          cfg.jitter)
            # Morton pixel order for primary-segment coherence; radiance
            # comes back pixel-indexed (pix ids ride the queue), so no
            # inverse gather is needed — but pix must carry the ORIGINAL
            # pixel ids, so permute rays and ids together.
            o = jnp.take(o, self._perm, axis=0)
            d = jnp.take(d, self._perm, axis=0)
            pix0 = self._perm.astype(jnp.float32)
            seed = jax.random.randint(k_path, (1,), 0, 2**31 - 1, jnp.int32)
            rad = segmented_trace(
                o, d, pix0, self._sph_tab, self._quad_tab, self._tri_tab,
                self._sph_cl, self._quad_cl, self._tri_cl, self._mats,
                self._lights_tab,
                seed, self.rows, self.segment, cfg.max_depth,
                cfg.t_min, cfg.t_max, sky, self._bb,
                self._interpret, cfg.russian_roulette_depth,
                self._vmem_kinds, self.sort_rays, self._nee,
                self._inst, self._itri_vmem,
                self._tri_cold, self._itri_cold)
            acc = rad if acc is None else acc + rad
        return acc / cfg.samples_per_frame
