#!/usr/bin/env python
"""Stage-by-stage cost of the bounce loop at benchmark shapes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, n=10):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.engines.tracer import trace_paths
    from parallelraytracing_tpu.ops.intersect import intersect_scene
    from parallelraytracing_tpu.ops.materials import (
        emitted, random_unit_vectors, scatter)

    R = 1 << 17
    cfg = RenderConfig(width=512, height=256, max_depth=20, ray_tile=R,
                       intersect_chunk=256)
    scene = jax.device_put(Scene(ScenePreset.RANDOM_BALLS_LARGE).build())
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (R, 3), jnp.float32, -30, 30)
    d = jax.random.normal(key, (R, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    print(f"device {jax.devices()[0]}, R={R}")

    # full hit record (not DCE-able)
    f = jax.jit(lambda s, o, d: intersect_scene(s, o, d, 1e-3, 1e16, 256))
    h = f(scene, o, d)
    dt = timeit(f, scene, o, d)
    print(f"intersect full record: {dt*1e3:8.2f} ms")

    f2 = jax.jit(lambda s, m: emitted(s, m))
    dt = timeit(f2, scene, h.mat)
    print(f"emitted:               {dt*1e3:8.2f} ms")

    unit = random_unit_vectors(key, R)
    uni = jax.random.uniform(key, (R,))
    f3 = jax.jit(lambda s, d, h, u, un: scatter(s, d, h, u, un))
    dt = timeit(f3, scene, d, h, unit, uni)
    print(f"scatter:               {dt*1e3:8.2f} ms")

    # one full bounce body (intersect + emit + rng + scatter + where)
    def bounce(s, o, d, key):
        hit = intersect_scene(s, o, d, 1e-3, 1e16, 256)
        k1, k2 = jax.random.split(key)
        u = random_unit_vectors(k1, R)
        un = jax.random.uniform(k2, (R,))
        nd, att, alive = scatter(s, d, hit, u, un)
        rad = jnp.where((alive & hit.hit)[:, None],
                        att * emitted(s, hit.mat), 0.0)
        return jnp.where(alive[:, None], nd, d), rad

    f4 = jax.jit(bounce)
    dt = timeit(f4, scene, o, d, key)
    print(f"one fused bounce:      {dt*1e3:8.2f} ms")

    # the real thing
    f5 = jax.jit(lambda s, o, d, k: trace_paths(s, o, d, k, cfg))
    dt = timeit(f5, scene, o, d, key, n=3)
    print(f"trace_paths depth20:   {dt*1e3:8.2f} ms")

    for depth in (1, 2, 5, 10):
        cfgd = cfg.replace(max_depth=depth)
        fD = jax.jit(lambda s, o, d, k: trace_paths(s, o, d, k, cfgd))
        dt = timeit(fD, scene, o, d, key, n=3)
        print(f"trace_paths depth{depth:2d}:   {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
