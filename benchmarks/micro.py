#!/usr/bin/env python
"""Microbenchmarks for the primitives that decide kernel design on TPU:
dynamic gather throughput (BVH node fetch), VPU elementwise throughput
(brute-force intersection math), threefry RNG, and full traversal /
intersect steps at benchmark-scale shapes.

Run: python benchmarks/micro.py [cpu]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, n=10):
    out = f(*args)
    import jax
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

    R = 1 << 21          # ~2M rays (1080p)
    M = 1617             # balls-scene BVH nodes
    MT = 40003           # 20k-tri mesh BVH nodes
    print(f"device: {jax.devices()[0]}")

    key = jax.random.PRNGKey(0)

    # 1. dynamic gather: (R,) indices into (M, C) table
    for m, label in [(M, "small-table"), (MT, "mesh-table")]:
        table = jax.random.normal(key, (m, 8), jnp.float32)
        idx = jax.random.randint(key, (R,), 0, m, jnp.int32)

        g = jax.jit(lambda t, i: t[i].sum(axis=0))
        dt = timeit(g, table, idx)
        print(f"gather {label} ({m}x8, {R} idx): {dt*1e3:8.2f} ms "
              f"-> {R*8/dt/1e9:7.2f} Gelem/s")

    # 2. VPU elementwise: the sphere-chunk inner math at (R, K)
    K = 128
    a = jax.random.normal(key, (R // 16, K), jnp.float32)

    def chunk_math(a):
        b2 = a * 1.5 - 0.25
        c = a * a - 1.0
        disc = b2 * b2 - c
        sq = jnp.sqrt(jnp.abs(disc))
        t1 = -b2 - sq
        t2 = -b2 + sq
        t = jnp.where(t1 >= 1e-3, t1, t2)
        ok = (disc >= 0) & (t >= 1e-3)
        return jnp.min(jnp.where(ok, t, 3e38), axis=1)

    f = jax.jit(chunk_math)
    dt = timeit(f, a)
    ops = a.size * 12
    print(f"vpu chunk math ({a.shape}): {dt*1e3:8.2f} ms "
          f"-> {ops/dt/1e12:6.2f} Tops/s")

    # 3. threefry normals (per-bounce RNG cost at full pool)
    f = jax.jit(lambda k: jax.random.normal(k, (R, 3), jnp.float32))
    dt = timeit(f, key)
    print(f"threefry normal (R,3): {dt*1e3:8.2f} ms")

    # 4. full brute-force intersect at 1080p scale (balls scene)
    from parallelraytracing_tpu import Scene, ScenePreset
    from parallelraytracing_tpu.ops.intersect import intersect_scene
    from parallelraytracing_tpu.accel.lbvh import build_bvh
    from parallelraytracing_tpu.accel.traverse import bvh_intersect_scene

    scene = jax.device_put(Scene(ScenePreset.RANDOM_BALLS_LARGE).build())
    o = jax.random.uniform(key, (R // 16, 3), jnp.float32, -30, 30)
    d = jax.random.normal(key, (R // 16, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    f = jax.jit(lambda s, o, d: intersect_scene(s, o, d, 1e-3, 1e16, 256).t)
    dt = timeit(f, scene, o, d, n=5)
    print(f"brute intersect ({R//16} rays x 809 prims): {dt*1e3:8.2f} ms "
          f"-> {R//16/dt/1e6:7.2f} Mray-isect/s")

    bvh = jax.device_put(build_bvh(scene))
    f = jax.jit(lambda s, b, o, d: bvh_intersect_scene(s, b, o, d, 1e-3, 1e16).t)
    dt = timeit(f, scene, bvh, o, d, n=5)
    print(f"bvh intersect   ({R//16} rays, {bvh.num_nodes} nodes): {dt*1e3:8.2f} ms "
          f"-> {R//16/dt/1e6:7.2f} Mray-isect/s")


if __name__ == "__main__":
    main()
