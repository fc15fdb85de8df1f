"""Sharded engine: the fused Pallas megakernel over EVERY available chip.

The multi-chip execution path as a first-class, user-selectable engine
(CLI `--engine sharded`, viewer radio button) instead of a
library-internal detail: a ("px","spp") `jax.sharding.Mesh` over all
visible devices, each device tracing its pixel block through the same
VMEM-resident megakernel, sample streams `psum`-reduced over ICI
(parallel/sharding.render_frame_sharded_fused).  On a single chip it
degenerates to a 1x1 mesh and matches the fused engine's cost; on a pod
it is the scaling story (the role NCCL/multi-GPU would play in the
reference, which is single-GPU only — SURVEY.md §2.4).

The per-pixel RNG is keyed on GLOBAL pixel ids and a per-(px,spp)-shard
seed, so the image is deterministic for a given device count and
invariant to the px-shard layout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.engines.base import Renderer, register_engine


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


@register_engine
class ShardedRenderer(Renderer):
    name = "sharded"

    #: rows per kernel tile (see FusedRenderer.rows); per-device pixel
    #: blocks pad to rows*128.
    rows: int = int(os.environ.get("PRT_ROWS", "24"))

    #: per-kind primitive count above which tables use VMEM row layout
    #: (the sharded path does not use the hot/cold split).
    vmem_threshold: int = 2048

    #: culling structure (pack_scene_tables accel option).
    accel: str = os.environ.get("PRT_TRAVERSAL", "auto")

    #: devices on the sample axis (rest go to the pixel axis); 1 =
    #: pure spatial data parallelism.
    spp_axis: int = int(os.environ.get("PRT_SPP_AXIS", "1"))

    def _post_init(self) -> None:
        from parallelraytracing_tpu.ops.pallas_trace import (
            pack_lights_table, pack_scene_tables, to_vmem_rows)
        from parallelraytracing_tpu.parallel.sharding import \
            make_render_mesh
        host_scene = jax.device_get(self._scene_data)
        sph, quad, tri, sph_cl, quad_cl, tri_cl, mats = pack_scene_tables(
            host_scene, accel=self.accel)
        kinds = []
        tabs = []
        for tab in (sph, quad, tri):
            vm = tab.shape[1] > self.vmem_threshold
            kinds.append(vm)
            tabs.append(jnp.asarray(to_vmem_rows(tab) if vm else tab))
        sky = tuple(float(x) for x in np.asarray(host_scene.sky))
        arrays = (*tabs, jnp.asarray(sph_cl), jnp.asarray(quad_cl),
                  jnp.asarray(tri_cl), jnp.asarray(mats),
                  jnp.asarray(pack_lights_table(host_scene)))
        n_dev = len(jax.devices())
        spp = self.spp_axis if n_dev % max(self.spp_axis, 1) == 0 else 1
        self._mesh = make_render_mesh(spp_axis=spp)
        self._interpret = not _on_tpu()

        from parallelraytracing_tpu.engines.fused import morton_pixel_perm
        from parallelraytracing_tpu.ops.pallas_trace import LANES
        from parallelraytracing_tpu.parallel.sharding import \
            render_frame_sharded_fused
        cfg = self.config
        mesh = self._mesh
        rows = self.rows
        interpret = self._interpret
        kinds = tuple(kinds)

        # Morton-order pixel ids so each device's block is a coherent
        # screen region (the fused engine's 1.34x tile win); pad slots
        # get out-of-range ids (harmless dummy rays).
        n_px = mesh.shape["px"]
        r = cfg.pixel_count
        blk = -(-r // n_px)
        blk += (-blk) % (rows * LANES)
        mperm, minv = morton_pixel_perm(cfg.width, cfg.height)
        perm = jnp.asarray(np.concatenate(
            [mperm, np.arange(r, n_px * blk)]).astype(np.int32))
        inv = jnp.asarray(minv)

        # one jitted entry per engine instance (statics close over the
        # mesh/config; the tables pytree stays a traced arg)
        @jax.jit
        def _frame(tables, cam, key, perm, inv):
            return render_frame_sharded_fused(
                (*tables, sky, kinds), cam, key, cfg, mesh,
                rows=rows, interpret=interpret, perm=perm, inv=inv)

        self._perm = perm
        self._inv = inv
        self._arrays = arrays
        self._frame_fn = _frame

    def render_sample_buffer(self, frame_index: int) -> jax.Array:
        cfg = self.config
        base = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), jnp.uint32(frame_index))
        acc = None
        for s in range(cfg.samples_per_frame):
            key = jax.random.fold_in(base, jnp.uint32(s))
            rad = self._frame_fn(self._arrays, self._cam_params, key,
                                 self._perm, self._inv)
            acc = rad if acc is None else acc + rad
        return acc / cfg.samples_per_frame
