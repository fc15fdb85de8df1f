"""Fused engine: the Pallas megakernel (whole bounce loop in VMEM).

The performance engine for moderate primitive counts: unlike the jnp
engines (whose per-bounce intermediates round-trip HBM), one kernel
invocation traces a ray tile start-to-finish.  Uses interpret mode
automatically off-TPU so it stays testable on CPU."""

from __future__ import annotations

from functools import partial

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


@register_engine
class FusedRenderer(Renderer):
    name = "fused"

    #: rows per tile: tile = rows*128 rays; VMEM state ~ rows*128*4B*~40
    import os as _os
    rows: int = int(_os.environ.get("PRT_ROWS", "16"))

    #: SMEM capacity guard: scene tables must fit scalar memory.
    max_table_bytes: int = 1 << 19

    #: per-kind primitive count above which the table moves from SMEM
    #: scalar layout to VMEM row layout (dynamic-sublane reads).
    vmem_threshold: int = 2048

    def _post_init(self) -> None:
        from parallelraytracing_tpu.ops.pallas_trace import to_vmem_rows
        sph, quad, tri, sph_cl, quad_cl, tri_cl = pack_scene_tables(
            jax.device_get(self._scene_data))
        self._sph_cl = jax.device_put(jnp.asarray(sph_cl))
        self._quad_cl = jax.device_put(jnp.asarray(quad_cl))
        self._tri_cl = jax.device_put(jnp.asarray(tri_cl))
        tabs = []
        kinds = []
        for tab in (sph, quad, tri):
            vm = tab.shape[1] > self.vmem_threshold
            kinds.append(vm)
            tabs.append(jax.device_put(jnp.asarray(
                to_vmem_rows(tab) if vm else tab)))
        self._sph_tab, self._quad_tab, self._tri_tab = tabs
        self._vmem_kinds = tuple(kinds)
        self._interpret = not _on_tpu()

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
            if pad:
                o = jnp.pad(o, ((0, pad), (0, 0)))
                d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            seed = jnp.asarray(
                [jax.random.randint(k_path, (), 0, 2**31 - 1, jnp.int32)],
                jnp.int32)
            rad = pallas_trace(o, d, self._sph_tab, self._quad_tab,
                               self._tri_tab, self._sph_cl, self._quad_cl,
                               self._tri_cl, seed, self.rows,
                               cfg.max_depth, cfg.t_min, cfg.t_max, sky,
                               interpret=self._interpret,
                               rr_depth=cfg.russian_roulette_depth,
                               vmem_kinds=self._vmem_kinds)[:r]
            acc = rad if acc is None else acc + rad
        return acc / cfg.samples_per_frame
