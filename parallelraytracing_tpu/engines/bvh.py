"""BVH engine: megakernel bounce loop over LBVH traversal.

The analogue of the reference's OptiX backend (src/backend/optix/*): the
acceleration structure is built once at init (renderer.cpp:703-871 builds
its GAS/IAS once, never refits) and every bounce intersects through it
instead of the O(N) primitive loop.

BEYOND the reference: set `animate` to a jit-safe (SceneData, frame) ->
SceneData update and every frame recomputes the moved primitives' leaf
AABBs + a bottom-up level-sweep refit of the SAME tree topology inside
the jitted frame step (accel/refit.py) — per-frame animated geometry the
reference cannot do (its AS is frozen after Init)."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from parallelraytracing_tpu.accel.lbvh import BVHData, build_bvh
from parallelraytracing_tpu.accel.refit import build_refit_plan, refit_bvh
from parallelraytracing_tpu.accel.traverse import bvh_intersect_scene
from parallelraytracing_tpu.config import RenderConfig
from parallelraytracing_tpu.core.scene import SceneData
from parallelraytracing_tpu.engines.base import Renderer, register_engine
from parallelraytracing_tpu.engines.megakernel import raygen
from parallelraytracing_tpu.engines.tracer import trace_paths_tiled


@partial(jax.jit, static_argnames=("cfg",))
def bvh_trace(scene: SceneData, bvh: BVHData, o: jax.Array, d: jax.Array,
              key: jax.Array, cfg: RenderConfig, lights=None) -> jax.Array:
    def intersect(s, oo, dd):
        return bvh_intersect_scene(s, bvh, oo, dd, cfg.t_min, cfg.t_max)

    return trace_paths_tiled(scene, o, d, key, cfg, intersect, lights)


@register_engine
class BVHRenderer(Renderer):
    name = "bvh"

    #: Optional jit-safe animation hook: (SceneData, frame i32) -> SceneData
    #: with IDENTICAL topology (same counts/kinds; positions/sizes move).
    animate: Optional[Callable[[SceneData, jax.Array], SceneData]] = None

    #: When animating, refit the tree (True) or keep the stale build-time
    #: AABBs (False — exists to demonstrate/test why refit is needed).
    refit: bool = True

    def _post_init(self) -> None:
        # AS build at Init (optix/renderer.cpp:949-1010 analogue).
        self._bvh = jax.device_put(build_bvh(self._scene_data))
        from parallelraytracing_tpu.ops.nee import extract_lights
        self._lights = (extract_lights(jax.device_get(self._scene_data))
                        if self.config.nee else None)
        if self.animate is not None:
            plan = build_refit_plan(self._bvh)
            animate = self.animate
            do_refit = self.refit

            @partial(jax.jit, static_argnames=("cfg",))
            def trace_animated(scene, bvh, o, d, key, frame, cfg):
                scene = animate(scene, frame)
                if do_refit:
                    bvh = refit_bvh(bvh, scene, plan)
                return bvh_trace(scene, bvh, o, d, key, cfg)

            self._trace_animated = trace_animated

    def render_sample_buffer(self, frame_index: int) -> jax.Array:
        cfg = self.config
        base = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), jnp.uint32(frame_index))
        acc = None
        for s in range(cfg.samples_per_frame):
            skey = jax.random.fold_in(base, jnp.uint32(s))
            k_jit, k_path = jax.random.split(skey)
            o, d = raygen(self._cam_params, k_jit, cfg.width, cfg.height,
                          cfg.jitter, cfg.lens, self._qseed,
                          self._qpt(frame_index, s))
            if self.animate is not None:
                rad = self._trace_animated(
                    self._scene_data, self._bvh, o, d, k_path,
                    jnp.int32(frame_index), cfg)
            else:
                rad = bvh_trace(self._scene_data, self._bvh, o, d, k_path,
                                cfg, self._lights)
            acc = rad if acc is None else acc + rad
        return acc / cfg.samples_per_frame
