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


def vpu_peak_vmem(shape=(8, 128), loops=512, n_tiles=4096,
                  mix="fma", interpret=False):
    """Measured VPU f32 elementwise peak with ALL operands VMEM/register
    resident (a Pallas kernel looping independent op chains on
    native-register (8,128) tiles) — the roofline ceiling for the fused
    path-trace kernel, whose working set never leaves VMEM.  The
    plain-XLA elementwise microbench streams HBM and measures bandwidth,
    not the VPU (61 GB/s ~ 30 Gop/s on this rig); this one measures the
    compute ceiling itself.

    mix="fma": 8 independent multiply-add chains (latency-hiding ILP).
    mix="slab": the slab-test op mix (fused multiply-sub + min/max +
    select) — the fused kernel's dominant op classes.
    Returns (seconds, total_lane_ops)."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if mix == "fma":
        ops_per_iter = 16  # 8 chains x (mul+add fused = 1 op) x 2 rounds

        def body(i, acc):
            out = []
            for k, a in enumerate(acc):
                a = a * (1.0 + (k + 1) * 1e-7) + (k + 1) * 1e-7
                a = a * (1.0 - (k + 1) * 1e-7) - (k + 1) * 1e-7
                out.append(a)
            return tuple(out)
    else:
        ops_per_iter = 16  # 8 chains x (fms, then min/max/select round)

        def body(i, acc):
            a, b, c, d, e, f, g, h = acc
            a = a * 1.0000001 - 1e-7
            b = b * 0.9999999 + 1e-7
            c = c * 1.0000002 - 2e-7
            d = d * 0.9999998 + 2e-7
            e = e * 1.0000003 - 3e-7
            f = f * 0.9999997 + 3e-7
            g = g * 1.0000004 - 4e-7
            h = h * 0.9999996 + 4e-7
            a = jnp.minimum(a, e)
            b = jnp.maximum(b, f)
            c = jnp.minimum(c, g)
            d = jnp.maximum(d, h)
            e = jnp.maximum(e, 0.1)
            f = jnp.minimum(f, 10.0)
            g = jnp.where(g > c, g, c)
            h = jnp.where(h < d, h, d)
            return a, b, c, d, e, f, g, h

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        accs = tuple(x * (0.5 + 0.05 * k) for k in range(8))
        accs = jax.lax.fori_loop(0, loops, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out

    spec = pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(n_tiles,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * shape[0], shape[1]),
                                       jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False)
    x = jnp.ones((n_tiles * shape[0], shape[1]), jnp.float32) * 0.5
    jf = jax.jit(f)

    from parallelraytracing_tpu.utils.sync import device_sync
    out = jf(x)
    device_sync(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = jf(x)
    device_sync(out)
    dt = (time.perf_counter() - t0) / reps
    total_ops = n_tiles * shape[0] * shape[1] * loops * ops_per_iter
    return dt, total_ops


def main():
    import jax
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # VMEM-resident VPU peak (roofline ceiling — see vpu_peak_vmem doc).
    on_tpu = jax.devices()[0].platform == "tpu"
    for mix in ("fma", "slab"):
        kw = {} if on_tpu else dict(n_tiles=2, loops=4, interpret=True)
        dt, ops = vpu_peak_vmem(mix=mix, **kw)
        print(f"vpu f32 {mix} peak (VMEM-resident): {dt*1e3:8.2f} ms "
              f"-> {ops/dt/1e12:6.3f} Tops/s")

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
