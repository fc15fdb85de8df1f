"""Fused Pallas path-trace kernels.

The true TPU megakernel (the role of GPU_RayTracing,
cuda_megakernel/renderer.cu:132-173): one kernel invocation traces a tile
of rays through the ENTIRE bounce loop with every intermediate living in
VMEM/registers — no HBM round-trips between bounces, which is what makes
the jnp engines bandwidth-bound.

Key TPU-native moves:
- Ray state is planar SoA (ROWS, 128) f32 planes (ox..dz, throughput,
  radiance), matching the VPU's (8,128) lanes.
- The closest-hit fold streams primitives as SCALARS from SMEM broadcast
  against the ray planes, and folds the winning primitive's material
  constants and normal into carried planes at test time — so shading needs
  NO per-lane gather (the tagged-pointer dispatch of the reference
  collapses into masked selects on carried constants).
- RNG is a stateless PCG hash of (pixel id, bounce, draw, frame seed) —
  exactly the OptiX backend's counter-based pattern (pcg_hash,
  optix/device_types.h:109-120, seeded per frame at
  device_programs.cu:169), not stateful curand.  Stateless hashing also
  works in the Pallas interpreter (pltpu.prng_random_bits does not).
- Unit vectors sampled analytically (z = 1-2u, phi = 2*pi*v) — exactly
  uniform on the sphere, replacing the reference's rejection loop
  (math.h:25-36).

Two kernels share one bounce step:
- pallas_trace: the fused megakernel (all bounces inside the kernel).
- pallas_bounce: one bounce over a compacted queue (the hybrid engine's
  intersect+shade stage); RNG is keyed on PIXEL ids so compaction order
  does not change the image.

Geometry/material semantics match ops/intersect.py and ops/materials.py
(which remain the correctness oracle); image agreement is statistical
(different RNG stream), verified in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.core.scene import (
    MAT_DIELECTRIC, MAT_EMISSIVE, MAT_LAMBERTIAN, MAT_METAL, SceneData)

LANES = 128
TWO_PI = 2.0 * math.pi
BIG = 3.0e38


# ---------------------------------------------------------------------------
# Scene flattening: one (C, Np) f32 table per primitive kind, each column a
# scalar constant consumed inside the kernel's primitive loop.
# ---------------------------------------------------------------------------

import os as _os

# Primitives per SMEM culling cluster (tunable for experiments).
CLUSTER = int(_os.environ.get("PRT_CLUSTER", "32"))


def _cluster_bounds(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """(N,3)x2 AABBs -> (6, ceil(N/CLUSTER)) cluster-union bounds."""
    n = len(mn)
    n_cl = max(1, -(-n // CLUSTER))
    out = np.zeros((6, n_cl), np.float32)
    for c in range(n_cl):
        lo, hi = c * CLUSTER, min((c + 1) * CLUSTER, n)
        if lo >= n:
            out[:3, c] = 1.0
            out[3:, c] = -1.0  # empty (inverted) box: never hit
        else:
            out[:3, c] = mn[lo:hi].min(0)
            out[3:, c] = mx[lo:hi].max(0)
    return out


def pack_scene_tables(scene: SceneData):
    """Returns (sph_tab, quad_tab, tri_tab, sph_cl, quad_cl, tri_cl)
    float32 host arrays.  Primitives of each kind are sorted by the Morton
    code of their AABB centroid so consecutive runs of CLUSTER primitives
    are spatially tight; *_cl holds each run's union AABB, letting the
    kernel skip whole clusters with one scalar-predicated slab test — an
    in-kernel two-level hierarchy with zero per-lane gathers.

    sph_tab  (16, Ns): cx cy cz r2 inv_r valid | mat(9) | ord
    quad_tab (23, Nq): n(3) cn us(3) cu vs(3) cv valid | mat(9) | ord
    tri_tab  (36, Nt): ng(3) p0ng e1(3) e2(3) e2xp0(3) p0xe1(3)
                       n0(3) n1(3) n2(3) valid | mat(9) | ord
    where mat(9) = mtype alb(3) emit(3) rough ior and ord is the original
    build order (the reference's first-wins tie-break for coplanar
    equal-t hits, primitive.cpp:42-48).
    """
    from parallelraytracing_tpu.accel.lbvh import morton3d
    from parallelraytracing_tpu.core import geometry as geo
    mt = np.asarray(scene.mat_type, np.float32)
    alb = np.asarray(scene.mat_albedo, np.float32)
    emit = np.asarray(scene.mat_emit, np.float32)
    rough = np.asarray(scene.mat_rough, np.float32)
    ior = np.asarray(scene.mat_ior, np.float32)

    def mat_cols(ids):
        ids = np.asarray(ids)
        return np.stack([
            mt[ids], alb[ids, 0], alb[ids, 1], alb[ids, 2],
            emit[ids, 0], emit[ids, 1], emit[ids, 2],
            rough[ids], ior[ids]], axis=0)

    def morton_order(mn, mx):
        cen = (mn + mx) * 0.5
        lo = cen.min(0)
        ext = np.maximum(cen.max(0) - lo, 1e-12)
        return np.argsort(morton3d((cen - lo) / ext), kind="stable")

    c = np.asarray(scene.sph_center, np.float32)
    r = np.asarray(scene.sph_radius, np.float32)
    sv = np.asarray(scene.sph_valid)
    s_mn, s_mx = geo.sphere_aabb(c.astype(np.float64), r.astype(np.float64))
    s_ord = morton_order(s_mn, s_mx)
    c, r, sv = c[s_ord], r[s_ord], sv[s_ord]
    inv_r = np.where(r > 0, 1.0 / np.maximum(r, 1e-30), 0.0)
    sph = np.concatenate([
        c.T, (r * r)[None], inv_r[None],
        sv.astype(np.float32)[None],
        mat_cols(np.asarray(scene.sph_mat)[s_ord]),
        s_ord.astype(np.float32)[None]], axis=0)
    # invalid pads get inverted boxes so their cluster test can't pass
    s_mn2 = np.where(sv[:, None], s_mn[s_ord], np.float64(1.0))
    s_mx2 = np.where(sv[:, None], s_mx[s_ord], np.float64(-1.0))
    sph_cl = _cluster_bounds(s_mn2, s_mx2)

    qn = np.asarray(scene.quad_normal, np.float32)
    qc = np.asarray(scene.quad_center, np.float32)
    qu = np.asarray(scene.quad_u, np.float32)
    qv = np.asarray(scene.quad_v, np.float32)
    qvd = np.asarray(scene.quad_valid)
    q_mn, q_mx = geo.quad_aabb(qc.astype(np.float64), qu.astype(np.float64),
                               qv.astype(np.float64))
    q_ord = morton_order(q_mn, q_mx)
    qn, qc, qu, qv, qvd = qn[q_ord], qc[q_ord], qu[q_ord], qv[q_ord], qvd[q_ord]
    us = qu / np.maximum((qu * qu).sum(1, keepdims=True), 1e-30)
    vs = qv / np.maximum((qv * qv).sum(1, keepdims=True), 1e-30)
    cn = (qc * qn).sum(1)
    cu = (qc * us).sum(1)
    cv = (qc * vs).sum(1)
    quad = np.concatenate([
        qn.T, cn[None], us.T, cu[None], vs.T, cv[None],
        qvd.astype(np.float32)[None],
        mat_cols(np.asarray(scene.quad_mat)[q_ord]),
        q_ord.astype(np.float32)[None]], axis=0)
    q_mn2 = np.where(qvd[:, None], q_mn[q_ord], np.float64(1.0))
    q_mx2 = np.where(qvd[:, None], q_mx[q_ord], np.float64(-1.0))
    quad_cl = _cluster_bounds(q_mn2, q_mx2)

    v0 = np.asarray(scene.tri_v0, np.float32)
    v1 = np.asarray(scene.tri_v1, np.float32)
    v2 = np.asarray(scene.tri_v2, np.float32)
    t_mn, t_mx = geo.triangle_aabb(v0.astype(np.float64),
                                   v1.astype(np.float64),
                                   v2.astype(np.float64))
    t_ord = morton_order(t_mn, t_mx)
    v0, v1, v2 = v0[t_ord], v1[t_ord], v2[t_ord]
    e1 = v1 - v0
    e2 = v2 - v0
    ng = np.cross(e1, e2)
    p0ng = (v0 * ng).sum(1)
    e2xp0 = np.cross(e2, v0)
    p0xe1 = np.cross(v0, e1)
    tvd = np.asarray(scene.tri_valid)[t_ord]
    tri = np.concatenate([
        ng.T, p0ng[None], e1.T, e2.T, e2xp0.T, p0xe1.T,
        np.asarray(scene.tri_n0, np.float32)[t_ord].T,
        np.asarray(scene.tri_n1, np.float32)[t_ord].T,
        np.asarray(scene.tri_n2, np.float32)[t_ord].T,
        tvd.astype(np.float32)[None],
        mat_cols(np.asarray(scene.tri_mat)[t_ord]),
        t_ord.astype(np.float32)[None]], axis=0)
    t_mn2 = np.where(tvd[:, None], t_mn[t_ord], np.float64(1.0))
    t_mx2 = np.where(tvd[:, None], t_mx[t_ord], np.float64(-1.0))
    tri_cl = _cluster_bounds(t_mn2, t_mx2)

    return (np.ascontiguousarray(sph), np.ascontiguousarray(quad),
            np.ascontiguousarray(tri), sph_cl, quad_cl, tri_cl)


# ---------------------------------------------------------------------------
# RNG: stateless PCG on per-lane counters.
# ---------------------------------------------------------------------------

def _pcg_hash(x: jax.Array) -> jax.Array:
    """PCG output permutation (optix/device_types.h:109-114)."""
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) \
        * jnp.uint32(277803737)
    return (word >> 22) ^ word


def _uniform01(counter: jax.Array, salt: int) -> jax.Array:
    """[0,1) uniforms from a stateless hash of per-lane counters."""
    bits = _pcg_hash(counter ^ jnp.uint32((salt * 0x9E3779B9) & 0xFFFFFFFF))
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits int32.
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# The shared bounce step (closest-hit fold + shading) on (rows,128) planes.
# ---------------------------------------------------------------------------

def make_reader(ref, vmem_rows: bool):
    """Per-primitive scalar accessor: j -> (k -> scalar).

    SMEM tables are (C, Np) with native dynamic scalar indexing; large
    tables use VMEM (Np, 128) rows — a dynamic-sublane row load plus
    static lane extracts (Mosaic allows dynamic sublane indices, only
    dynamic LANE indices must be 128-aligned)."""
    if vmem_rows:
        def get(j):
            row = ref[j]
            return lambda k: row[k]
    else:
        def get(j):
            return lambda k: ref[k, j]
    return get


def _make_bounce_step(shape, t_min, t_max, sky, n_sph, n_quad, n_tri,
                      sph_get, quad_get, tri_get, rr_depth: int = 0,
                      cluster_refs=None):
    f0 = jnp.zeros(shape, jnp.float32)

    def bounce_step(rng_d, state, depth=None):
        """state = (ox,oy,oz, dx,dy,dz, tr,tg,tb, rr,rg,rb, alive_f32)."""
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = state
        alive_b = alive > 0.0

        # Safe reciprocal directions for the cluster slab tests.
        eps = 1e-20
        inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps,
                                 jnp.where(dx < 0, -eps, eps), dx)
        inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps,
                                 jnp.where(dy < 0, -eps, eps), dy)
        inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps,
                                 jnp.where(dz < 0, -eps, eps), dz)

        # ---------------- closest hit fold over all primitives
        best_t = jnp.full(shape, BIG, jnp.float32)
        carry0 = (best_t, f0, f0, f0, f0, f0,
                  f0, f0, f0, f0, f0, f0, f0,
                  jnp.full(shape, 1.0, jnp.float32),
                  jnp.full(shape, float(1 << 24), jnp.float32))  # best_ord

        def fold(carry, t, ok, fr, nxp, nyp, nzp, mat, ordv):
            (best_t, nx, ny, nz, front, m_type,
             m_ar, m_ag, m_ab, m_er, m_eg, m_eb, m_rough, m_ior,
             best_ord) = carry
            # strict < with lowest-original-ordinal tie-break: primitives
            # are Morton-sorted, so visit order no longer matches the
            # reference's first-wins list order — the carried ordinal
            # restores it (coplanar Cornell light/walls).
            upd = ok & ((t < best_t) | ((t == best_t) & (ordv < best_ord)))
            sel = lambda a, b: jnp.where(upd, a, b)
            return (sel(t, best_t), sel(nxp, nx), sel(nyp, ny),
                    sel(nzp, nz), sel(fr, front), sel(mat[0], m_type),
                    sel(mat[1], m_ar), sel(mat[2], m_ag), sel(mat[3], m_ab),
                    sel(mat[4], m_er), sel(mat[5], m_eg), sel(mat[6], m_eb),
                    sel(mat[7], m_rough), sel(mat[8], m_ior),
                    sel(ordv, best_ord))

        def clustered(n, cl_ref, body, carry):
            """fori over CLUSTER-sized runs, skipping runs whose union AABB
            no live ray can hit at better-than-best t (the in-kernel
            two-level hierarchy; cluster data is scalar -> no gathers)."""
            n_cl = max(1, -(-n // CLUSTER))
            if cl_ref is None or n <= CLUSTER:
                return jax.lax.fori_loop(0, n, body, carry)

            def cl_body(ci, carry):
                bx0 = cl_ref[0, ci]; by0 = cl_ref[1, ci]; bz0 = cl_ref[2, ci]
                bx1 = cl_ref[3, ci]; by1 = cl_ref[4, ci]; bz1 = cl_ref[5, ci]
                tx0 = (bx0 - ox) * inv_dx
                tx1 = (bx1 - ox) * inv_dx
                ty0 = (by0 - oy) * inv_dy
                ty1 = (by1 - oy) * inv_dy
                tz0 = (bz0 - oz) * inv_dz
                tz1 = (bz1 - oz) * inv_dz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                hit = (tn <= tf) & (tf >= t_min) & (tn <= carry[0]) & alive_b
                pred = jnp.sum(hit.astype(jnp.float32)) > 0.0

                def do(carry):
                    lo = ci * CLUSTER
                    hi = jnp.minimum(lo + CLUSTER, n)
                    return jax.lax.fori_loop(lo, hi, body, carry)

                return jax.lax.cond(pred, do, lambda c: c, carry)

            return jax.lax.fori_loop(0, n_cl, cl_body, carry)

        # --- spheres (shape.h:157-203 semantics)
        def sph_body(j, carry):
            g = sph_get(j)
            cx = g(0); cy = g(1); cz = g(2)
            r2 = g(3); inv_r = g(4)
            valid = g(5)
            mat = tuple(g(6 + k) for k in range(9))
            ordv = g(15)
            ocx = ox - cx; ocy = oy - cy; ocz = oz - cz
            b2 = dx * ocx + dy * ocy + dz * ocz
            cterm = ocx * ocx + ocy * ocy + ocz * ocz - r2
            disc = b2 * b2 - cterm
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_near = -b2 - sq
            t_far = -b2 + sq
            fr = (t_near >= t_min).astype(jnp.float32)
            t = jnp.where(fr > 0, t_near, t_far)
            ok = (disc >= 0.0) & (t >= t_min) & (t <= t_max) & (valid > 0)
            px = ox + t * dx; py = oy + t * dy; pz = oz + t * dz
            sgn = fr * 2.0 - 1.0
            return fold(carry, t, ok, fr,
                        (px - cx) * inv_r * sgn, (py - cy) * inv_r * sgn,
                        (pz - cz) * inv_r * sgn, mat, ordv)

        sph_cl = cluster_refs[0] if cluster_refs else None
        carry = clustered(n_sph, sph_cl, sph_body, carry0)

        # --- quads (shape.h:213-239 baked to world space)
        def quad_body(j, carry):
            g = quad_get(j)
            qnx = g(0); qny = g(1); qnz = g(2)
            cn = g(3)
            usx = g(4); usy = g(5); usz = g(6)
            cu = g(7)
            vsx = g(8); vsy = g(9); vsz = g(10)
            cv = g(11)
            valid = g(12)
            mat = tuple(g(13 + k) for k in range(9))
            ordv = g(22)
            dn = dx * qnx + dy * qny + dz * qnz
            on = ox * qnx + oy * qny + oz * qnz
            denom_ok = jnp.abs(dn) >= 1e-8
            inv_dn = jnp.where(denom_ok, 1.0 / jnp.where(denom_ok, dn, 1.0), 0.0)
            t = (cn - on) * inv_dn
            a = (ox * usx + oy * usy + oz * usz) \
                + t * (dx * usx + dy * usy + dz * usz) - cu
            b = (ox * vsx + oy * vsy + oz * vsz) \
                + t * (dx * vsx + dy * vsy + dz * vsz) - cv
            ok = denom_ok & (t > t_min) & (t <= t_max) \
                & (a * a < 1.0) & (b * b < 1.0) & (valid > 0)
            fr = (on - cn > 0.0).astype(jnp.float32)
            sgn = fr * 2.0 - 1.0
            return fold(carry, t, ok, fr, qnx * sgn, qny * sgn, qnz * sgn,
                        mat, ordv)

        quad_cl = cluster_refs[1] if cluster_refs else None
        carry = clustered(n_quad, quad_cl, quad_body, carry)

        # --- triangles (Moller-Trumbore via triple products; smooth normal
        #     interpolated from barycentrics at test time, shape.h:262-303)
        wx = oy * dz - oz * dy
        wy = oz * dx - ox * dz
        wz = ox * dy - oy * dx

        def tri_body(j, carry):
            g = tri_get(j)
            ngx, ngy, ngz, p0ng = g(0), g(1), g(2), g(3)
            e1x, e1y, e1z = g(4), g(5), g(6)
            e2x, e2y, e2z = g(7), g(8), g(9)
            xpx, xpy, xpz = g(10), g(11), g(12)   # e2 x p0
            pex, pey, pez = g(13), g(14), g(15)   # p0 x e1
            n0x, n0y, n0z = g(16), g(17), g(18)
            n1x, n1y, n1z = g(19), g(20), g(21)
            n2x, n2y, n2z = g(22), g(23), g(24)
            valid = g(25)
            mat = tuple(g(26 + k) for k in range(9))
            ordv = g(35)
            div = -(dx * ngx + dy * ngy + dz * ngz)
            div_ok = div != 0.0
            inv = jnp.where(div_ok, 1.0 / jnp.where(div_ok, div, 1.0), 0.0)
            t = (ox * ngx + oy * ngy + oz * ngz - p0ng) * inv
            b1 = ((wx * e2x + wy * e2y + wz * e2z)
                  - (dx * xpx + dy * xpy + dz * xpz)) * inv
            b2_ = (-(wx * e1x + wy * e1y + wz * e1z)
                   - (dx * pex + dy * pey + dz * pez)) * inv
            ok = div_ok & (t >= t_min) & (t <= t_max) \
                & (b1 >= 0.0) & (b2_ >= 0.0) & (b1 + b2_ <= 1.0) \
                & (valid > 0)
            b0 = 1.0 - b1 - b2_
            inx = b0 * n0x + b1 * n1x + b2_ * n2x
            iny = b0 * n0y + b1 * n1y + b2_ * n2y
            inz = b0 * n0z + b1 * n1z + b2_ * n2z
            back = (dx * inx + dy * iny + dz * inz) > 0.0
            sgn = jnp.where(back, -1.0, 1.0)
            ilen = jax.lax.rsqrt(jnp.maximum(
                inx * inx + iny * iny + inz * inz, 1e-30))
            fr = jnp.where(back, 0.0, 1.0)
            return fold(carry, t, ok, fr,
                        inx * sgn * ilen, iny * sgn * ilen,
                        inz * sgn * ilen, mat, ordv)

        tri_cl = cluster_refs[2] if cluster_refs else None
        carry = clustered(n_tri, tri_cl, tri_body, carry)

        (best_t, nx, ny, nz, front, m_type,
         m_ar, m_ag, m_ab, m_er, m_eg, m_eb, m_rough, m_ior, _) = carry

        hit = best_t < BIG

        # miss: sky * throughput, kill (cuda_megakernel/renderer.cu:98-101)
        miss = alive_b & ~hit
        mw = miss.astype(jnp.float32)
        rr = rr + mw * tr * sky[0]
        rg = rg + mw * tg * sky[1]
        rb = rb + mw * tb * sky[2]

        # emission before the scatter test (material.h:119-132)
        lit = alive_b & hit
        lw = lit.astype(jnp.float32) * (m_type == MAT_EMISSIVE)
        rr = rr + lw * tr * m_er
        rg = rg + lw * tg * m_eg
        rb = rb + lw * tb * m_eb

        # RNG draws
        u1 = _uniform01(rng_d, 1)
        u2 = _uniform01(rng_d, 2)
        u3 = _uniform01(rng_d, 3)
        z = 1.0 - 2.0 * u1
        rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = TWO_PI * u2
        ux = rxy * jnp.cos(phi)
        uy = rxy * jnp.sin(phi)
        uz = z

        px = ox + best_t * dx
        py = oy + best_t * dy
        pz = oz + best_t * dz

        # ---------------- BSDFs (branchless, material.h semantics)
        is_lam = m_type == MAT_LAMBERTIAN
        is_met = m_type == MAT_METAL
        is_die = m_type == MAT_DIELECTRIC

        lx = nx + ux; ly = ny + uy; lz = nz + uz
        degen = (jnp.abs(lx) < 1e-8) & (jnp.abs(ly) < 1e-8) \
            & (jnp.abs(lz) < 1e-8)
        lx = jnp.where(degen, nx, lx)
        ly = jnp.where(degen, ny, ly)
        lz = jnp.where(degen, nz, lz)

        dn_ = dx * nx + dy * ny + dz * nz
        rxm = dx - 2.0 * dn_ * nx + m_rough * ux
        rym = dy - 2.0 * dn_ * ny + m_rough * uy
        rzm = dz - 2.0 * dn_ * nz + m_rough * uz

        ri = jnp.where(front > 0, 1.0 / m_ior, m_ior)
        cos_t = jnp.minimum(-(dx * nx + dy * ny + dz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        cannot = ri * sin_t > 1.0
        r0 = (1.0 - ri) / (1.0 + ri)
        r0 = r0 * r0
        one_mc = 1.0 - cos_t
        schl = r0 + (1.0 - r0) * one_mc * one_mc * one_mc * one_mc * one_mc
        refl_choice = cannot | (schl > u3)
        qx = ri * (dx + cos_t * nx)
        qy = ri * (dy + cos_t * ny)
        qz = ri * (dz + cos_t * nz)
        qpar = -jnp.sqrt(jnp.abs(1.0 - (qx * qx + qy * qy + qz * qz)))
        fx = qx + qpar * nx
        fy = qy + qpar * ny
        fz = qz + qpar * nz
        gx = dx - 2.0 * dn_ * nx
        gy = dy - 2.0 * dn_ * ny
        gz = dz - 2.0 * dn_ * nz
        ex = jnp.where(refl_choice, gx, fx)
        ey = jnp.where(refl_choice, gy, fy)
        ez = jnp.where(refl_choice, gz, fz)

        sx = jnp.where(is_lam, lx, jnp.where(is_met, rxm, ex))
        sy = jnp.where(is_lam, ly, jnp.where(is_met, rym, ey))
        sz = jnp.where(is_lam, lz, jnp.where(is_met, rzm, ez))
        ilen = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz,
                                         1e-30))
        sx = sx * ilen; sy = sy * ilen; sz = sz * ilen

        met_ok = (sx * nx + sy * ny + sz * nz) > 0.0
        # float-valued select: Mosaic cannot select_n on i1 vectors
        scat_ok = jnp.where(is_met, met_ok.astype(jnp.float32),
                            (is_lam | is_die).astype(jnp.float32)) > 0.5

        att_r = jnp.where(is_die, 1.0, m_ar)
        att_g = jnp.where(is_die, 1.0, m_ag)
        att_b = jnp.where(is_die, 1.0, m_ab)

        cont = lit & scat_ok
        cw = cont.astype(jnp.float32)
        ncw = 1.0 - cw
        tr = tr * (ncw + cw * att_r)
        tg = tg * (ncw + cw * att_g)
        tb = tb * (ncw + cw * att_b)

        if rr_depth > 0 and depth is not None:
            # Russian roulette (unbiased; listed as future work in the
            # reference, wavefront.md:91-96): survive with p = max channel
            # throughput, compensating survivors by 1/p.
            p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)), 0.05, 1.0)
            u4 = _uniform01(rng_d, 4)
            roulette = depth >= rr_depth
            survive_f = jnp.where(roulette & (u4 >= p), 0.0, 1.0)
            boost = jnp.where(roulette & (survive_f > 0) & cont,
                              1.0 / p, 1.0)
            tr = tr * boost
            tg = tg * boost
            tb = tb * boost
            cw = cw * survive_f
        ox = jnp.where(cont, px, ox)
        oy = jnp.where(cont, py, oy)
        oz = jnp.where(cont, pz, oz)
        dx = jnp.where(cont, sx, dx)
        dy = jnp.where(cont, sy, dy)
        dz = jnp.where(cont, sz, dz)

        return (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, cw)

    return bounce_step


# ---------------------------------------------------------------------------
# Kernel 1: full megakernel (all bounces in one invocation).
# ---------------------------------------------------------------------------

def _make_trace_kernel(rows, max_depth, t_min, t_max, n_sph, n_quad, n_tri,
                       sky, rr_depth=0, vmem_kinds=(False, False, False)):
    import jax.experimental.pallas as pl

    def kernel(seed_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               sph_ref, quad_ref, tri_ref, sph_cl, quad_cl, tri_cl,
               rr_ref, rg_ref, rb_ref):
        tile = pl.program_id(0)
        shape = (rows, LANES)
        row_id = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        lane_id = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        ray_id = (jnp.uint32(tile) * jnp.uint32(rows * LANES)
                  + row_id * jnp.uint32(LANES) + lane_id)
        rng_base = _pcg_hash(ray_id ^ seed_ref[0].astype(jnp.uint32))

        step = _make_bounce_step(
            shape, t_min, t_max, sky, n_sph, n_quad, n_tri,
            make_reader(sph_ref, vmem_kinds[0]),
            make_reader(quad_ref, vmem_kinds[1]),
            make_reader(tri_ref, vmem_kinds[2]),
            rr_depth, (sph_cl, quad_cl, tri_cl))

        f0 = jnp.zeros(shape, jnp.float32)
        f1 = jnp.ones(shape, jnp.float32)
        state = (ox_ref[:], oy_ref[:], oz_ref[:],
                 dx_ref[:], dy_ref[:], dz_ref[:],
                 f1, f1, f1, f0, f0, f0, f1)

        def bounce(depth, state):
            # Early exit: a fully-terminated tile skips the primitive loops
            # (the queue-emptiness check the reference disabled to avoid
            # host sync, renderer.cu:422-425 — free on-device here).
            any_alive = jnp.sum(state[12]) > 0.0

            def live(st):
                rng_d = rng_base + jnp.uint32(depth) * jnp.uint32(0x85EBCA6B)
                return step(rng_d, st, depth)

            return jax.lax.cond(any_alive, live, lambda st: st, state)

        state = jax.lax.fori_loop(0, max_depth, bounce, state)
        rr_ref[:] = state[9]
        rg_ref[:] = state[10]
        rb_ref[:] = state[11]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rows", "max_depth", "t_min", "t_max", "sky",
                     "interpret", "rr_depth", "vmem_kinds"))
def pallas_trace(o: jax.Array, d: jax.Array, sph_tab: jax.Array,
                 quad_tab: jax.Array, tri_tab: jax.Array,
                 sph_cl: jax.Array, quad_cl: jax.Array, tri_cl: jax.Array,
                 seed: jax.Array,
                 rows: int, max_depth: int, t_min: float, t_max: float,
                 sky: Tuple[float, float, float],
                 interpret: bool = False, rr_depth: int = 0,
                 vmem_kinds: Tuple[bool, bool, bool] = (False, False, False),
                 ) -> jax.Array:
    """Trace R rays (R divisible by rows*128). Returns (R,3) radiance."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = o.shape[0]
    tile = rows * LANES
    assert r % tile == 0, (r, tile)
    n_tiles = r // tile

    planes = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    planes = [p.reshape(n_tiles * rows, LANES) for p in planes]

    def tab_n(tab, vm):
        return int(tab.shape[0]) if vm else int(tab.shape[1])

    kernel = _make_trace_kernel(rows, max_depth, t_min, t_max,
                                tab_n(sph_tab, vmem_kinds[0]),
                                tab_n(quad_tab, vmem_kinds[1]),
                                tab_n(tri_tab, vmem_kinds[2]),
                                sky, rr_depth, vmem_kinds)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # Scene tables live in SMEM: the kernel reads them as SCALARS with
    # dynamic per-primitive indices, which VMEM vector loads cannot do
    # (Mosaic requires lane indices provably 128-aligned).
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    tab_specs = [vmem_full if vm else smem for vm in vmem_kinds]
    interp = pltpu.InterpretParams() if interpret else False
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem, *[ray_spec] * 6, *tab_specs, smem, smem, smem],
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * rows, LANES), jnp.float32)
                   ] * 3,
        interpret=interp,
    )(seed, *planes, sph_tab, quad_tab, tri_tab, sph_cl, quad_cl, tri_cl)

    rr, rg, rb = out
    return jnp.stack([rr.reshape(r), rg.reshape(r), rb.reshape(r)], axis=1)


# ---------------------------------------------------------------------------
# Kernel 2: single bounce over a compacted queue (hybrid engine stage).
# ---------------------------------------------------------------------------

def _make_bounce_kernel(rows, t_min, t_max, n_sph, n_quad, n_tri, sky,
                        rr_depth=0, vmem_kinds=(False, False, False)):
    import jax.experimental.pallas as pl

    def kernel(scalar_ref,  # SMEM (3,): [seed, depth, count]
               pix_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tr_ref, tg_ref, tb_ref,
               sph_ref, quad_ref, tri_ref, sph_cl, quad_cl, tri_cl,
               oxo, oyo, ozo, dxo, dyo, dzo, tro, tgo, tbo,
               rro, rgo, rbo, alive_o):
        tile = pl.program_id(0)
        shape = (rows, LANES)
        seed = scalar_ref[0]
        depth = scalar_ref[1]
        count = scalar_ref[2]

        in_queue_start = tile * jnp.int32(rows * LANES)
        row_id = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane_id = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        slot = in_queue_start + row_id * jnp.int32(LANES) + lane_id
        in_q = (slot < count).astype(jnp.float32)

        # Pixel-keyed RNG: compaction order cannot change the image.
        rng_base = _pcg_hash(
            pix_ref[:].astype(jnp.int32).astype(jnp.uint32)  # f32 pix ids
            ^ seed.astype(jnp.uint32))
        rng_d = rng_base + depth.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)

        step = _make_bounce_step(
            shape, t_min, t_max, sky, n_sph, n_quad, n_tri,
            make_reader(sph_ref, vmem_kinds[0]),
            make_reader(quad_ref, vmem_kinds[1]),
            make_reader(tri_ref, vmem_kinds[2]),
            rr_depth, (sph_cl, quad_cl, tri_cl))

        f0 = jnp.zeros(shape, jnp.float32)
        state = (ox_ref[:], oy_ref[:], oz_ref[:],
                 dx_ref[:], dy_ref[:], dz_ref[:],
                 tr_ref[:], tg_ref[:], tb_ref[:],
                 f0, f0, f0, in_q)

        def live(st):
            return step(rng_d, st, depth)

        any_work = jnp.sum(in_q) > 0.0
        state = jax.lax.cond(any_work, live, lambda st: st, state)

        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = state
        oxo[:] = ox; oyo[:] = oy; ozo[:] = oz
        dxo[:] = dx; dyo[:] = dy; dzo[:] = dz
        tro[:] = tr; tgo[:] = tg; tbo[:] = tb
        rro[:] = rr; rgo[:] = rg; rbo[:] = rb
        alive_o[:] = alive

    return kernel


def pallas_bounce(pix, o9, sph_tab, quad_tab, tri_tab,
                  sph_cl, quad_cl, tri_cl, scalars,
                  rows: int, t_min: float, t_max: float,
                  sky: Tuple[float, float, float],
                  interpret: bool = False, rr_depth: int = 0,
                  vmem_kinds: Tuple[bool, bool, bool] = (False, False, False)):
    """One bounce over the (queue-ordered) ray planes.

    pix: (R,) f32 pixel ids; o9: tuple of 9 (R,) f32 planes
    (ox,oy,oz,dx,dy,dz,tr,tg,tb); scalars: (3,) i32 [seed, depth, count].
    Returns (new 9 planes, radiance add 3 planes, alive (R,) f32)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = pix.shape[0]
    tile = rows * LANES
    assert r % tile == 0
    n_tiles = r // tile

    planes = [pix, *o9]
    planes = [p.reshape(n_tiles * rows, LANES) for p in planes]

    def tab_n(tab, vm):
        return int(tab.shape[0]) if vm else int(tab.shape[1])

    kernel = _make_bounce_kernel(rows, t_min, t_max,
                                 tab_n(sph_tab, vmem_kinds[0]),
                                 tab_n(quad_tab, vmem_kinds[1]),
                                 tab_n(tri_tab, vmem_kinds[2]),
                                 sky, rr_depth, vmem_kinds)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    interp = pltpu.InterpretParams() if interpret else False

    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    tab_specs = [vmem_full if vm else smem for vm in vmem_kinds]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem, *[ray_spec] * 10, *tab_specs, smem, smem, smem],
        out_specs=[ray_spec] * 13,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * rows, LANES), jnp.float32)
                   ] * 13,
        interpret=interp,
    )(scalars, *planes, sph_tab, quad_tab, tri_tab, sph_cl, quad_cl, tri_cl)

    flat = [p.reshape(r) for p in out]
    return flat[:9], flat[9:12], flat[12]


def to_vmem_rows(tab: np.ndarray) -> np.ndarray:
    """(C, Np) SMEM-layout table -> (Np, 128) VMEM row layout (dynamic
    sublane reads + static lane extracts inside the kernel)."""
    c, n = tab.shape
    assert c <= LANES
    out = np.zeros((n, LANES), np.float32)
    out[:, :c] = tab.T
    return out
