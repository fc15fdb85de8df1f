"""Hybrid engine: wavefront compaction driving the Pallas bounce kernel.

The architecture the hardware numbers demand (see ARCHITECTURE.md): the
fused megakernel wastes VPU lanes on dead rays (average path length ~2.3
of a 20-bounce budget, so ~89% of tile-bounce work is masked out), while
the jnp wavefront pays HBM for every intermediate.  This engine keeps the
best of both:

- per-bounce ray state lives in flat (R,) planes in HBM (one gather +
  one scatter per bounce — ~26 plane-passes at 61 GB/s, a few ms);
- the intersect+shade stage is ONE Pallas kernel invocation over the
  compacted queue: kernel tiles beyond the live count skip all work, so
  VPU time scales with ALIVE rays (the reference wavefront's stated but
  unrealized goal, wavefront.md:60-67);
- compaction is the same cumsum-scatter as the jnp wavefront engine;
- RNG is pixel-keyed inside the kernel, so compaction order does not
  change the image.

The whole frame is one jit: raygen -> while(count>0 & depth<max) { gather
by queue, pallas_bounce, scatter back, compact } -> radiance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.config import RenderConfig
from parallelraytracing_tpu.engines.base import Renderer, register_engine
from parallelraytracing_tpu.engines.megakernel import raygen
from parallelraytracing_tpu.ops.pallas_trace import (LANES, pack_scene_tables,
                                                     pallas_bounce)


@partial(jax.jit,
         static_argnames=("rows", "max_depth", "t_min", "t_max", "sky",
                          "interpret", "rr_depth", "vmem_kinds"))
def hybrid_trace(o, d, sph_tab, quad_tab, tri_tab,
                 sph_cl, quad_cl, tri_cl, mats, seed,
                 rows: int, max_depth: int, t_min: float, t_max: float,
                 sky, interpret: bool = False, rr_depth: int = 0,
                 vmem_kinds=(False, False, False)):
    """Returns (R,3) radiance for camera rays (o, d)."""
    r = o.shape[0]
    tile = rows * LANES
    pad = (-r) % tile
    rp = r + pad

    def padp(x, c=0.0):
        return jnp.pad(x, (0, pad), constant_values=c) if pad else x

    # Pool state: flat (Rp,) planes.
    pool = [padp(o[:, 0]), padp(o[:, 1]), padp(o[:, 2]),
            padp(d[:, 0]), padp(d[:, 1]), padp(d[:, 2], 1.0),
            jnp.ones(rp), jnp.ones(rp), jnp.ones(rp)]       # throughput
    rad = [jnp.zeros(rp), jnp.zeros(rp), jnp.zeros(rp)]
    queue = jnp.arange(rp, dtype=jnp.int32)
    count = jnp.int32(r)

    def cond(state):
        depth, count, *_ = state
        return (depth < max_depth) & (count > 0)

    def bounce(state):
        depth, count, queue, pool, rad = state

        # Gather the compacted queue's state into kernel order.
        qpix = queue.astype(jnp.float32)
        q9 = [p[queue] for p in pool]

        scalars = jnp.stack([seed[0], depth, count]).astype(jnp.int32)
        new9, radd, alive = pallas_bounce(
            qpix, tuple(q9), sph_tab, quad_tab, tri_tab,
            sph_cl, quad_cl, tri_cl, mats, scalars,
            rows, t_min, t_max, sky, interpret, rr_depth, vmem_kinds)

        # Scatter updated state back to the pool (only live queue slots).
        lane = jnp.arange(rp)
        in_q = lane < count
        widx = jnp.where(in_q, queue, rp)  # rp = dropped
        pool = [p.at[widx].set(v, mode="drop") for p, v in zip(pool, new9)]
        rad = [p.at[widx].add(v, mode="drop") for p, v in zip(rad, radd)]

        # Compact survivors (queue order preserved -> pixel-stable).
        alive_q = (alive > 0.0) & in_q
        pos = jnp.cumsum(alive_q.astype(jnp.int32)) - 1
        new_count = pos[-1] + 1
        new_queue = jnp.zeros((rp,), jnp.int32).at[
            jnp.where(alive_q, pos, rp)].set(queue, mode="drop")

        return (depth + 1, new_count, new_queue, pool, rad)

    state = (jnp.int32(0), count, queue, pool, rad)
    state = jax.lax.while_loop(cond, bounce, state)
    rad = state[4]
    return jnp.stack([rad[0][:r], rad[1][:r], rad[2][:r]], axis=1)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


@register_engine
class HybridRenderer(Renderer):
    name = "hybrid"
    rows: int = 16
    max_table_bytes: int = 1 << 19

    vmem_threshold: int = 2048

    def _post_init(self) -> None:
        from parallelraytracing_tpu.ops.pallas_trace import to_vmem_rows
        sph, quad, tri, sph_cl, quad_cl, tri_cl, mats = pack_scene_tables(
            jax.device_get(self._scene_data))
        self._sph_cl = jax.device_put(jnp.asarray(sph_cl))
        self._quad_cl = jax.device_put(jnp.asarray(quad_cl))
        self._tri_cl = jax.device_put(jnp.asarray(tri_cl))
        self._mats = jax.device_put(jnp.asarray(mats))
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
        sky = tuple(float(x) for x in np.asarray(self._scene_data.sky))
        acc = None
        for s in range(cfg.samples_per_frame):
            skey = jax.random.fold_in(base, jnp.uint32(s))
            k_jit, k_path = jax.random.split(skey)
            o, d = raygen(self._cam_params, k_jit, cfg.width, cfg.height,
                          cfg.jitter)
            seed = jax.random.randint(k_path, (1,), 0, 2**31 - 1, jnp.int32)
            rad = hybrid_trace(o, d, self._sph_tab, self._quad_tab,
                               self._tri_tab, self._sph_cl, self._quad_cl,
                               self._tri_cl, self._mats, seed, self.rows,
                               cfg.max_depth, cfg.t_min, cfg.t_max, sky,
                               self._interpret,
                               cfg.russian_roulette_depth,
                               self._vmem_kinds)
            acc = rad if acc is None else acc + rad
        return acc / cfg.samples_per_frame
