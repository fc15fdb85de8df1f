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
- pallas_segment: n bounces over a compacted queue (the wavefront_fused
  engine's stage); RNG is keyed on PIXEL ids so compaction/sort order
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
    KIND_SPHERE, MAT_DIELECTRIC, MAT_EMISSIVE, MAT_LAMBERTIAN, MAT_METAL,
    SceneData)

LANES = 128
TWO_PI = 2.0 * math.pi
BIG = 3.0e38


# ---------------------------------------------------------------------------
# Scene flattening: one (C, Np) f32 table per primitive kind, each column a
# scalar constant consumed inside the kernel's primitive loop.
# ---------------------------------------------------------------------------

import os as _os

# Primitives per culling leaf.  Per-kind: sphere/quad SAH leaves
# measured best at 24 (251.7 ms vs 258 at 16 and 256.5 at 32 on the
# headline, RESULTS.md); triangle meshes pay for smaller leaves (fewer
# tested prims per entered leaf) — 4 measured best (8 was a wash with
# the SAH tree, worse with the Karras one).
CLUSTER = int(_os.environ.get("PRT_CLUSTER", "24"))
TRI_CLUSTER = int(_os.environ.get("PRT_CLUSTER_TRI", "4"))
#: SBVH spatial-split trigger: child-overlap area > alpha x root area
#: lets a duplicate-and-clip spatial split compete with the object
#: split in the SAH tree build (0 = plain SAH, no duplication).
SBVH_ALPHA = float(_os.environ.get("PRT_SBVH_ALPHA", "0"))
#: Nearly-always-hit node splice: an internal SAH node whose surface
#: area is >= tau x its parent's is removed from the threaded table
#: (its children link directly to the parent).  For the whole-tile
#: any-lane-hit walk such nodes pass their slab test almost every
#: entry, so the test is pure overhead; the preorder escape links
#: encode arbitrary arity, so this is a host-side table rewrite with
#: BIT-IDENTICAL traversal results (leaf runs unchanged).  0 disables.
#: Default 0.6 — the measured optimum (dragon 1471->1382, bunny
#: 1044->985, spheres neutral; 0.45 over-flattens 2.7x, RESULTS.md).
COLLAPSE_TAU = float(_os.environ.get("PRT_COLLAPSE_TAU", "0.6"))
#: Absolute-area splice companion: also splice an internal node whose
#: surface area is >= abs_alpha x the ROOT's.  The whole-TILE union
#: amplifies per-ray hit probability (any of ~3072 spread lanes), so
#: top-of-tree nodes are near-certain entries even when their
#: parent-ratio sits below COLLAPSE_TAU.  0 disables.
COLLAPSE_ABS = float(_os.environ.get("PRT_COLLAPSE_ABS", "0"))
#: Tile-SAH build cost (experimental lever): model the kernel's
#: whole-tile ANY-LANE entry by saturating each child's entry
#: probability at 1 — split cost = min(1, K*A_child/A_parent)*N_child
#: with classic SAH as an epsilon tiebreak.  K ~ the number of
#: effectively-independent rays per tile.  Changes split SELECTION
#: (the splice only post-processes a classic tree); traversal results
#: stay bit-identical by the global-ordinal winner fold.  0 = classic
#: SAH (default).  Incompatible with PRT_SBVH_ALPHA (different cost
#: scales); tile-SAH skips the SBVH competition.
TILE_SAH_K = float(_os.environ.get("PRT_TILE_SAH_K", "0"))

# Straggler-tail traversal (sphere/quad SAH trees): when > 0, the tree
# table carries a second FINE view (leaves of TAIL_CLUSTER primitives)
# and bounces >= TAIL_DEPTH walk it instead of the fat-leaf view — tiles
# kept alive by 1-2 straggler lanes then test far fewer primitives per
# entered leaf (the dead-tail cost the round-2 diagnostics measured).
# 0 disables (single fat view, round-2 behavior).
TAIL_CLUSTER = int(_os.environ.get("PRT_TAIL_CLUSTER", "0"))
TAIL_DEPTH = int(_os.environ.get("PRT_TAIL_DEPTH", "4"))


def _cluster_bounds(mn: np.ndarray, mx: np.ndarray,
                    csize: int = None) -> np.ndarray:
    """(N,3)x2 AABBs -> (6, ceil(N/csize)) cluster-union bounds."""
    csize = csize or CLUSTER
    n = len(mn)
    n_cl = max(1, -(-n // csize))
    out = np.zeros((6, n_cl), np.float32)
    for c in range(n_cl):
        lo, hi = c * csize, min((c + 1) * csize, n)
        if lo >= n:
            out[:3, c] = 1.0
            out[3:, c] = -1.0  # empty (inverted) box: never hit
        else:
            out[:3, c] = mn[lo:hi].min(0)
            out[3:, c] = mx[lo:hi].max(0)
    return out


def _cluster_tree(cl: np.ndarray, n_prims: int,
                  csize: int = None) -> np.ndarray:
    """(6, n_cl) cluster-union bounds -> (8, M) threaded BVH table.

    The in-kernel acceleration structure (the role of the reference's
    OptiX GAS, optix/renderer.cpp:703-831): a Karras radix tree built over
    the Morton-run clusters, flattened to threaded preorder so a
    whole-tile lockstep walk needs no stack.  Layout per node column:
    rows 0-5 AABB (min xyz, max xyz), row 6 miss link (-1 terminates),
    row 7 packed leaf range lo*64 + span (-1 for internal nodes; span
    < 64 asserted — cluster sizes are <= 32).  Everything is f32 (exact
    below 2^24).  8 rows exactly because SMEM windows pad rows to
    multiples of 8 (smem_padded_bytes) — a 9th row would cost 2x.
    M = 2*n_cl - 1."""
    from parallelraytracing_tpu.accel.lbvh import (_karras_tree, morton3d,
                                                   thread_tree)
    csize = csize or CLUSTER
    n_cl = cl.shape[1]
    # Effective boxes: the kernel's slab test is min/max-swap insensitive,
    # so an "inverted" empty box behaves as its swapped corners.
    emn = np.minimum(cl[:3], cl[3:]).T.astype(np.float64)  # (n_cl, 3)
    emx = np.maximum(cl[:3], cl[3:]).T.astype(np.float64)
    if n_cl == 1:
        assert n_prims < 64
        out = np.zeros((8, 1), np.float32)
        out[:6, 0] = cl[:, 0]
        out[6, 0] = -1.0
        out[7, 0] = float(n_prims)  # lo = 0, span = n_prims
        return out

    cen = (emn + emx) * 0.5
    lo = cen.min(0)
    ext = np.maximum(cen.max(0) - lo, 1e-12)
    codes = morton3d((cen - lo) / ext)
    order = np.argsort(codes, kind="stable")
    keys = (codes[order].astype(np.uint64) << np.uint64(31)) \
        | np.arange(n_cl, dtype=np.uint64)
    left, right = _karras_tree(keys)
    is_leaf, payload, miss = thread_tree(left, right, n_cl)

    m = 2 * n_cl - 1
    out = np.zeros((8, m), np.float32)
    node_mn = np.zeros((m, 3))
    node_mx = np.zeros((m, 3))
    leaf_slots = np.nonzero(is_leaf)[0]
    src = order[payload[leaf_slots]]          # cluster id per leaf
    node_mn[leaf_slots] = emn[src]
    node_mx[leaf_slots] = emx[src]
    lo_p = src * csize
    span = np.minimum(lo_p + csize, n_prims) - lo_p
    assert csize < 64 and (span >= 0).all() \
        and (lo_p * 64 + span < (1 << 24)).all()
    out[7] = -1.0
    out[7, leaf_slots] = lo_p * 64 + span

    # Internal AABBs: reverse-preorder stack sweep (children precede their
    # parent when walking preorder backwards).
    stack = []
    for s in range(m - 1, -1, -1):
        if is_leaf[s]:
            stack.append((node_mn[s].copy(), node_mx[s].copy()))
        else:
            mn1, mx1 = stack.pop()
            mn2, mx2 = stack.pop()
            node_mn[s] = np.minimum(mn1, mn2)
            node_mx[s] = np.maximum(mx1, mx2)
            stack.append((node_mn[s], node_mx[s]))
    assert len(stack) == 1
    out[:3] = node_mn.T
    out[3:6] = node_mx.T
    out[6] = miss
    return np.ascontiguousarray(out)


#: scalar-stack capacity for the ordered walk (tree depth bound; Karras
#: trees over Morton-sorted clusters are near-balanced, asserted at build).
STACK_CAP = 128


def _sah_threaded_tree(mn: np.ndarray, mx: np.ndarray, csize: int,
                       tail_csize: int = 0, sbvh_alpha: float = 0.0,
                       clip_verts=None, sbvh_max_factor: float = 1.4,
                       collapse_tau: float = 0.0,
                       collapse_abs: float = 0.0,
                       tile_k: float = 0.0,
                       align: int = 0):
    """Binned-SAH BVH over PRIMITIVE AABBs -> (perm, (8, M) threaded
    table in the _cluster_tree layout).

    With collapse_tau > 0 internal nodes whose surface area is
    >= collapse_tau x their parent's are SPLICED OUT of the emitted
    table: their children attach directly to the parent (the threaded
    preorder + escape-link encoding is arity-agnostic, so the kernel
    walk is unchanged).  Rationale: the whole-tile ANY-LANE-HIT slab
    test enters a child box with probability ~1 when its area barely
    shrinks the parent's — for divergent tiles that test is pure
    overhead (dragon diagnostics: 8.3k slab tests vs 3.6k primitive
    tests per tile).  Leaf runs and the primitive permutation are
    untouched, so traversal results stay bit-identical; only the
    visit/test schedule changes.

    With sbvh_alpha > 0 the build adds SPATIAL splits (SBVH, Stich et
    al. 2009): when the best object split's child overlap exceeds
    alpha x root area, a chopped-binning spatial split competes, and
    straddling primitives are DUPLICATED into both children with their
    bounds clipped to the split plane (exact triangle-polygon clip when
    clip_verts = (v0, v1, v2) row arrays are given; conservative box
    clip otherwise).  `perm` is then a REFERENCE list — original column
    ids with duplicates, total capped at sbvh_max_factor x n — and the
    caller packs the primitive table as tab[:, perm].  Closest-hit
    results are BIT-IDENTICAL to the single-reference tree: a
    duplicated primitive carries the same t and the same global
    ordinal, so the winner fold is unchanged; only the number of tested
    candidates shrinks (long thin diagonal primitives stop inflating
    every leaf box they merely graze — the overlap pathology the
    reference offloads to OptiX's splitting builder).

    With tail_csize > 0 (straggler-tail traversal, see TAIL_CLUSTER):
    the tree is BUILT at tail_csize granularity, then TWO threaded views
    share one table: columns [0, Mc) are the COARSE view (maximal
    subtrees holding <= csize primitives collapsed into fat leaves — the
    cheap walk for fully-alive bounces) and columns [Mc, M) are the FINE
    view (tail_csize leaves — fewer primitives tested per entered leaf
    when only straggler lanes are alive).  Both views index the same
    permuted primitive columns, so traversal results are bit-identical;
    returns (perm, table, Mc) in that case (Mc = the fine view's root
    column, fed to the kernel as a walk start).

    With align > 0 (the STREAMED big-mesh layout): every leaf's perm
    range starts at a multiple of `align` (gaps padded with -1 sentinel
    entries the caller maps to a never-hit column) and row 7 encodes
    (lo // align) * mult + span with mult = the next power of two above
    csize — so a leaf is exactly one align-sized, align-aligned block
    of table rows, the unit the kernel DMAs from HBM into VMEM scratch
    (the path that lifts both the 2^18-triangle packed-leaf cap and the
    ~25k-triangle VMEM-residency wall; the reference's OptiX backend
    ingests such meshes through optixAccelBuild's own memory manager,
    optix/renderer.cpp:703-765).  Requires csize <= align; incompatible
    with tail_csize/sbvh.

    Replaces the Karras-over-Morton-runs topology for the tree path:
    top-down builds with a 16-bin surface-area heuristic per axis, leaf
    bounds are the EXACT union of their primitives (Morton runs padded
    them to run unions), and leaves hold <= csize primitives.  perm
    reorders primitive columns so each leaf is a contiguous run; invalid
    primitives (inverted boxes) go LAST, outside every leaf run — the
    tree never visits them at all.  The reference leans on OptiX's
    (SAH-quality) GAS builds for exactly this (optix/renderer.cpp:703-
    871); this is the host-side TPU analogue feeding the in-kernel
    lockstep walk."""
    import sys
    n = len(mn)
    if align:
        assert csize <= align and not tail_csize and sbvh_alpha == 0.0
    if tail_csize and tail_csize >= csize:
        tail_csize = 0
    leaf_size = tail_csize if tail_csize else csize
    valid = (mn <= mx).all(1)
    ids_v = np.nonzero(valid)[0]
    ids_i = np.nonzero(~valid)[0]
    if len(ids_v) == 0:
        out = np.zeros((8, 1), np.float32)
        out[:3, 0] = 1.0
        out[3:6, 0] = -1.0
        out[6, 0] = -1.0
        out[7, 0] = 0.0  # empty leaf: lo = 0, span = 0
        if tail_csize:
            return np.arange(n), out, 0
        return np.arange(n), out

    NB = 16

    def area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    perm_out = []
    # node records: [mn(3), mx(3), kind, a, b]; kind 0 internal (a, b =
    # child record ids), kind 1 leaf (a, b = perm range lo, hi)
    recs = []

    sys.setrecursionlimit(max(10000, sys.getrecursionlimit()))

    # --- SBVH machinery (active when sbvh_alpha > 0) -------------------
    root_area = area(mn[ids_v].min(0), mx[ids_v].max(0))
    ref_budget = [int(sbvh_max_factor * len(ids_v)) - len(ids_v)]

    def clip_ref(i, rmn_i, rmx_i, ax, plo, phi):
        """Bounds of primitive i restricted to the slab [plo, phi] on
        axis ax, intersected with the ref's current box.  Exact polygon
        clip for triangles when vertices are available; conservative
        box clip otherwise."""
        if clip_verts is not None:
            pts = np.array([clip_verts[0][i], clip_verts[1][i],
                            clip_verts[2][i]], np.float64)
            # Sutherland-Hodgman against the two axis planes.
            for pos, keep_ge in ((plo, True), (phi, False)):
                out = []
                for a_i in range(len(pts)):
                    a = pts[a_i]
                    b = pts[(a_i + 1) % len(pts)]
                    da = (a[ax] - pos) if keep_ge else (pos - a[ax])
                    db = (b[ax] - pos) if keep_ge else (pos - b[ax])
                    if da >= 0:
                        out.append(a)
                    if (da > 0) != (db > 0) and da != db:
                        t = da / (da - db)
                        out.append(a + t * (b - a))
                if not out:
                    return None
                pts = np.asarray(out)
            cmn, cmx = pts.min(0), pts.max(0)
            # the polygon clip is exact; still intersect with the ref's
            # carried box (itself possibly clipped by ancestors)
            cmn = np.maximum(cmn, rmn_i)
            cmx = np.minimum(cmx, rmx_i)
            if (cmn > cmx).any():
                return None
            return cmn, cmx
        cmn, cmx = rmn_i.copy(), rmx_i.copy()
        cmn[ax] = max(cmn[ax], plo)
        cmx[ax] = min(cmx[ax], phi)
        if cmn[ax] > cmx[ax]:
            return None
        return cmn, cmx

    def spatial_split(ids, rmn, rmx, bmn, bmx):
        """Best chopped-binning spatial split for this node: returns
        (cost, ax, plane, b0, b1) or None.  b0/b1 = first/last bin each
        ref spans (entry/exit bins)."""
        best = None
        for ax in range(3):
            lo, hi = bmn[ax], bmx[ax]
            ext = hi - lo
            if ext <= 1e-12:
                continue
            scale = NB / ext
            b0 = np.clip(((rmn[:, ax] - lo) * scale).astype(np.int64),
                         0, NB - 1)
            b1 = np.clip((np.ceil((rmx[:, ax] - lo) * scale)
                          .astype(np.int64)) - 1, 0, NB - 1)
            b1 = np.maximum(b1, b0)
            # per-bin chopped bounds (box chop for COST EVAL only; the
            # actual duplication below uses the exact clip)
            bin_mn = np.full((NB, 3), np.inf)
            bin_mx = np.full((NB, 3), -np.inf)
            for k in range(NB):
                span = (b0 <= k) & (b1 >= k)
                if not span.any():
                    continue
                plo = lo + k * ext / NB
                phi = lo + (k + 1) * ext / NB
                cmn = rmn[span].copy()
                cmx = rmx[span].copy()
                cmn[:, ax] = np.maximum(cmn[:, ax], plo)
                cmx[:, ax] = np.minimum(cmx[:, ax], phi)
                bin_mn[k] = cmn.min(0)
                bin_mx[k] = cmx.max(0)
            entries = np.bincount(b0, minlength=NB)
            exits = np.bincount(b1, minlength=NB)
            pre_a = np.zeros(NB)
            suf_a = np.zeros(NB)
            cmn = np.full(3, np.inf)
            cmx = np.full(3, -np.inf)
            for k in range(NB):
                cmn = np.minimum(cmn, bin_mn[k])
                cmx = np.maximum(cmx, bin_mx[k])
                pre_a[k] = area(cmn, cmx) if np.isfinite(cmn).all() else 0.0
            cmn = np.full(3, np.inf)
            cmx = np.full(3, -np.inf)
            for k in range(NB - 1, -1, -1):
                cmn = np.minimum(cmn, bin_mn[k])
                cmx = np.maximum(cmx, bin_mx[k])
                suf_a[k] = area(cmn, cmx) if np.isfinite(cmn).all() else 0.0
            pre_e = np.cumsum(entries)
            suf_x = np.cumsum(exits[::-1])[::-1]
            for k in range(NB - 1):
                nl = pre_e[k]
                nr = suf_x[k + 1]
                if nl == 0 or nr == 0:
                    continue
                dup = nl + nr - len(ids)
                if dup > ref_budget[0]:
                    continue
                cost = pre_a[k] * nl + suf_a[k + 1] * nr
                if best is None or cost < best[0]:
                    best = (cost, ax, lo + (k + 1) * ext / NB, b0, b1)
        return best

    def build(ids, rmn, rmx, depth=0):
        bmn = rmn.min(0)
        bmx = rmx.max(0)
        rcen = (rmn + rmx) * 0.5
        if len(ids) <= leaf_size:
            if align:  # stream layout: leaf run starts align-aligned
                perm_out.extend([-1] * ((-len(perm_out)) % align))
            lo = len(perm_out)
            perm_out.extend(ids.tolist())
            recs.append([bmn, bmx, 1, lo, len(perm_out)])
            return len(recs) - 1
        cmin = rcen.min(0)
        cmax = rcen.max(0)
        ext = cmax - cmin
        pa = max(area(bmn, bmx), 1e-30)
        best = None  # (cost, axis, bins, split)
        # SAH can split pathologically unbalanced (1 vs n-1 per level);
        # beyond depth 60 force median splits so host recursion and the
        # ordered walk's STACK_CAP stay bounded (~60 + log2 n).
        if depth > 60:
            order = np.argsort(rcen[:, int(np.argmax(ext))], kind="stable")
            half = len(ids) // 2
            ol, orr = order[:half], order[half:]
            rec = [bmn, bmx, 0, -1, -1]
            recs.append(rec)
            me = len(recs) - 1
            rec[3] = build(ids[ol], rmn[ol], rmx[ol], depth + 1)
            rec[4] = build(ids[orr], rmn[orr], rmx[orr], depth + 1)
            return me
        for ax in range(3):
            if ext[ax] <= 1e-12:
                continue
            b = np.minimum(((rcen[:, ax] - cmin[ax]) / ext[ax]
                            * NB).astype(np.int64), NB - 1)
            counts = np.bincount(b, minlength=NB)
            # per-bin bounds
            bin_mn = np.full((NB, 3), np.inf)
            bin_mx = np.full((NB, 3), -np.inf)
            for k in range(NB):
                sel = b == k
                if counts[k]:
                    bin_mn[k] = rmn[sel].min(0)
                    bin_mx[k] = rmx[sel].max(0)
            # prefix/suffix sweeps
            pre_a = np.zeros(NB)
            suf_a = np.zeros(NB)
            cmn = np.full(3, np.inf)
            cmx = np.full(3, -np.inf)
            for k in range(NB):
                cmn = np.minimum(cmn, bin_mn[k])
                cmx = np.maximum(cmx, bin_mx[k])
                pre_a[k] = area(cmn, cmx) if np.isfinite(cmn).all() else 0.0
            cmn = np.full(3, np.inf)
            cmx = np.full(3, -np.inf)
            for k in range(NB - 1, -1, -1):
                cmn = np.minimum(cmn, bin_mn[k])
                cmx = np.maximum(cmx, bin_mx[k])
                suf_a[k] = area(cmn, cmx) if np.isfinite(cmn).all() else 0.0
            pre_n = np.cumsum(counts)
            # child-overlap area of the best plane on this axis (the
            # SBVH trigger, computed during the sweep below)
            for k in range(NB - 1):
                nl = pre_n[k]
                nr = len(ids) - nl
                if nl == 0 or nr == 0:
                    continue
                classic = pre_a[k] * nl + suf_a[k + 1] * nr
                if tile_k > 0.0:
                    # Tile-SAH: whole-tile ANY-LANE entry saturates a
                    # child's entry probability at 1; inside saturated
                    # regions classic SAH breaks ties.
                    cost = (min(1.0, tile_k * pre_a[k] / pa) * nl
                            + min(1.0, tile_k * suf_a[k + 1] / pa) * nr
                            + 1e-6 * classic / pa)
                else:
                    cost = classic
                if best is None or cost < best[0]:
                    best = (cost, ax, b, k, bin_mn, bin_mx)
        # SBVH: when the object split's children overlap more than
        # alpha x root area, let a spatial split compete.
        if (best is not None and sbvh_alpha > 0.0 and ref_budget[0] > 0
                and tile_k == 0.0):  # SBVH competes on the classic scale
            _, ax, b, k, bin_mn, bin_mx = best
            lmx = bin_mx[:k + 1].max(0)
            rmn_b = bin_mn[k + 1:].min(0)
            ov_mn = np.maximum(bin_mn[:k + 1].min(0), rmn_b)
            ov_mx = np.minimum(lmx, bin_mx[k + 1:].max(0))
            if ((ov_mn <= ov_mx).all()
                    and area(ov_mn, ov_mx) > sbvh_alpha * root_area):
                sb = spatial_split(ids, rmn, rmx, bmn, bmx)
                if sb is not None and sb[0] < best[0]:
                    _, sax, plane, b0, b1 = sb
                    # partition: fully-left, fully-right, straddling
                    left_f = np.nonzero(
                        rmx[:, sax] <= plane)[0]
                    right_f = np.nonzero(
                        rmn[:, sax] >= plane)[0]
                    strad = np.nonzero((rmx[:, sax] > plane)
                                       & (rmn[:, sax] < plane))[0]
                    li = [ids[left_f]]
                    lmn = [rmn[left_f]]
                    lmxl = [rmx[left_f]]
                    ri = [ids[right_f]]
                    rmn2 = [rmn[right_f]]
                    rmx2 = [rmx[right_f]]
                    for s in strad:
                        cl_ = clip_ref(ids[s], rmn[s], rmx[s], sax,
                                       -np.inf, plane)
                        cr_ = clip_ref(ids[s], rmn[s], rmx[s], sax,
                                       plane, np.inf)
                        if cl_ is not None and cr_ is not None:
                            li.append(ids[s:s + 1])
                            lmn.append(cl_[0][None])
                            lmxl.append(cl_[1][None])
                            ri.append(ids[s:s + 1])
                            rmn2.append(cr_[0][None])
                            rmx2.append(cr_[1][None])
                        elif cl_ is not None:
                            li.append(ids[s:s + 1])
                            lmn.append(cl_[0][None])
                            lmxl.append(cl_[1][None])
                        else:
                            cr_ = cr_ or (rmn[s], rmx[s])
                            ri.append(ids[s:s + 1])
                            rmn2.append(cr_[0][None])
                            rmx2.append(cr_[1][None])
                    l_ids = np.concatenate(li)
                    l_rmn = np.concatenate(lmn)
                    l_rmx = np.concatenate(lmxl)
                    r_ids = np.concatenate(ri)
                    r_rmn = np.concatenate(rmn2)
                    r_rmx = np.concatenate(rmx2)
                    if len(l_ids) and len(r_ids):
                        ref_budget[0] -= (len(l_ids) + len(r_ids)
                                          - len(ids))
                        rec = [bmn, bmx, 0, -1, -1]
                        recs.append(rec)
                        me = len(recs) - 1
                        rec[3] = build(l_ids, l_rmn, l_rmx, depth + 1)
                        rec[4] = build(r_ids, r_rmn, r_rmx, depth + 1)
                        return me
        if best is None:
            half = len(ids) // 2
            sel = np.zeros(len(ids), bool)
            sel[:half] = True
        else:
            _, ax, b, k = best[:4]
            sel = b <= k
        rec = [bmn, bmx, 0, -1, -1]
        recs.append(rec)
        me = len(recs) - 1
        rec[3] = build(ids[sel], rmn[sel], rmx[sel], depth + 1)
        rec[4] = build(ids[~sel], rmn[~sel], rmx[~sel], depth + 1)
        return me

    root = build(ids_v, mn[ids_v].astype(np.float64),
                 mx[ids_v].astype(np.float64))
    perm = np.concatenate([np.asarray(perm_out, np.int64),
                           ids_i]).astype(np.int64)
    if align:
        # -1 padding entries map to a never-hit column; every real
        # primitive appears exactly once
        real = perm[perm >= 0]
        assert len(real) == n and len(set(real.tolist())) == n
        n = len(perm)
    elif sbvh_alpha > 0.0:
        # refs may duplicate; every valid primitive must appear >= once
        assert set(perm.tolist()) == set(range(n))
        n = len(perm)  # downstream sizes follow the ref count
    else:
        assert len(perm) == n and len(set(perm.tolist())) == n

    # Per-record primitive counts and (contiguous) perm ranges — children
    # records have higher ids than their parent, so one reverse sweep.
    m = len(recs)
    cnt = np.zeros(m, np.int64)
    rlo = np.zeros(m, np.int64)
    rhi = np.zeros(m, np.int64)
    for ri in range(m - 1, -1, -1):
        _, _, kind, a, b = recs[ri]
        if kind == 1:
            cnt[ri] = b - a
            rlo[ri], rhi[ri] = a, b
        else:
            cnt[ri] = cnt[a] + cnt[b]
            rlo[ri] = min(rlo[a], rlo[b])
            rhi[ri] = max(rhi[a], rhi[b])

    def emit(collapse, base):
        """Threaded preorder with escape links (child i escapes to its
        next sibling's slot; the last child escapes to the parent's
        escape).  A record emits as a LEAF when it is one, or when its
        subtree holds <= collapse primitives (the coarse view); escape
        links are offset by `base` (the view's first column).

        With collapse_tau > 0, internal children whose area is
        >= collapse_tau x the parent's are spliced out (their children
        become the parent's — arbitrary arity, same link encoding)."""
        def is_leaf_rec(ri):
            return recs[ri][2] == 1 or (collapse and cnt[ri] <= collapse)

        rarea = np.array([area(np.asarray(r[0]), np.asarray(r[1]))
                          for r in recs])
        kids_memo = {}

        def kids_of(ri):
            """Spliced child list of an internal record (recursion depth
            bounded by the build's depth-60 median-split cap)."""
            ks = kids_memo.get(ri)
            if ks is None:
                ks = []
                for c in (recs[ri][3], recs[ri][4]):
                    # Parent-ratio rule (collapse_tau) OR absolute-area
                    # rule (collapse_abs x root area): either marks the
                    # child's slab test a near-certain tile hit.
                    if (not is_leaf_rec(c)
                        and ((collapse_tau > 0.0
                              and rarea[c] >= collapse_tau * rarea[ri])
                             or (collapse_abs > 0.0
                                 and rarea[c] >= collapse_abs
                                 * rarea[root]))):
                        ks.extend(kids_of(c))
                    else:
                        ks.append(c)
                kids_memo[ri] = ks
            return ks

        size = np.ones(m, np.int64)
        for ri in range(m - 1, -1, -1):
            if not is_leaf_rec(ri):
                size[ri] = 1 + sum(size[c] for c in kids_of(ri))
        out = np.zeros((8, size[root]), np.float32)
        slot = 0
        stack = [(root, -1)]
        while stack:
            ri, esc = stack.pop()
            bmn, bmx, kind, a, b = recs[ri]
            out[:3, slot] = bmn
            out[3:6, slot] = bmx
            out[6, slot] = esc
            if is_leaf_rec(ri):
                lo, span = rlo[ri], rhi[ri] - rlo[ri]
                if align:
                    # stream layout: (chunk index) * mult + span
                    mult = 1 << int(np.ceil(np.log2(csize + 1)))
                    assert lo % align == 0 and 0 <= span <= csize
                    enc = (lo // align) * mult + span
                    if enc >= (1 << 24):
                        raise ValueError(
                            f"streamed leaf encoding overflows f32 "
                            f"integer range at chunk {lo // align} "
                            f"(raise PRT_STREAM_CHUNK).")
                    out[7, slot] = enc
                    slot += 1
                    continue
                assert 0 <= span < 64
                if lo * 64 + span >= (1 << 24):
                    raise ValueError(
                        f"threaded-tree leaf encoding overflows f32 "
                        f"integer range at {lo + span} primitives (packed "
                        f"lo*64+span must stay < 2^24, i.e. < {1 << 18} "
                        f"primitives per table). Use the streamed "
                        f"big-mesh layout (align > 0) or split the mesh.")
                out[7, slot] = lo * 64 + span
            else:
                out[7, slot] = -1.0
                ks = kids_of(ri)
                nxt = base + slot + 1
                escs = []
                for c in ks:
                    nxt += size[c]
                    escs.append(nxt)  # next sibling's slot
                escs[-1] = esc        # last child exits like the parent
                for c, e in zip(reversed(ks), reversed(escs)):
                    stack.append((c, e))
            slot += 1
        assert slot == size[root]
        return out

    if not tail_csize:
        return perm, emit(None, 0)
    coarse = emit(csize, 0)
    fine = emit(None, coarse.shape[1])
    return perm, np.concatenate([coarse, fine], axis=1), coarse.shape[1]


def _cluster_stack_tree(cl: np.ndarray, n_prims: int,
                        csize: int = None) -> np.ndarray:
    """(6, n_cl) cluster-union bounds -> (10, M) ORDERED-traversal BVH.

    Same Karras radix tree as _cluster_tree, but laid out with explicit
    child pointers instead of escape links so the kernel can visit the
    NEAR child first (front-to-back traversal — the ordering the
    reference gets for free from OptiX's hardware traversal,
    optix/renderer.cpp:703-871): early best_t tightening culls far
    subtrees that the fixed preorder of the threaded layout must test.
    Layout per node column: rows 0-5 AABB (min xyz, max xyz); row 6 left
    child column (-1 marks a leaf); row 7 right child column (internal)
    or leaf primitive-range start; row 8 split axis 0/1/2 (internal) or
    range end; row 9 reserved.  `left` is the child with the SMALLER
    AABB center along axis, so a ray travelling positive along axis
    visits left first."""
    from parallelraytracing_tpu.accel.lbvh import (_karras_tree, morton3d,
                                                   thread_tree)
    csize = csize or CLUSTER
    n_cl = cl.shape[1]
    emn = np.minimum(cl[:3], cl[3:]).T.astype(np.float64)
    emx = np.maximum(cl[:3], cl[3:]).T.astype(np.float64)
    if n_cl == 1:
        out = np.zeros((10, 1), np.float32)
        out[:6, 0] = cl[:, 0]
        out[6, 0] = -1.0
        out[7, 0] = 0.0
        out[8, 0] = float(n_prims)
        return out

    cen = (emn + emx) * 0.5
    lo = cen.min(0)
    ext = np.maximum(cen.max(0) - lo, 1e-12)
    codes = morton3d((cen - lo) / ext)
    order = np.argsort(codes, kind="stable")
    keys = (codes[order].astype(np.uint64) << np.uint64(31)) \
        | np.arange(n_cl, dtype=np.uint64)
    left, right = _karras_tree(keys)
    is_leaf, payload, miss = thread_tree(left, right, n_cl)

    m = 2 * n_cl - 1
    out = np.zeros((10, m), np.float32)
    node_mn = np.zeros((m, 3))
    node_mx = np.zeros((m, 3))
    leaf_slots = np.nonzero(is_leaf)[0]
    src = order[payload[leaf_slots]]
    node_mn[leaf_slots] = emn[src]
    node_mx[leaf_slots] = emx[src]
    out[6] = -1.0
    out[7, leaf_slots] = src * csize
    out[8, leaf_slots] = np.minimum(src * csize + csize, n_prims)

    # internal AABBs: reverse-preorder sweep (children precede parents).
    stack = []
    for s in range(m - 1, -1, -1):
        if is_leaf[s]:
            stack.append((node_mn[s].copy(), node_mx[s].copy()))
        else:
            mn1, mx1 = stack.pop()
            mn2, mx2 = stack.pop()
            node_mn[s] = np.minimum(mn1, mn2)
            node_mx[s] = np.maximum(mx1, mx2)
            stack.append((node_mn[s], node_mx[s]))
    assert len(stack) == 1
    out[:3] = node_mn.T
    out[3:6] = node_mx.T

    # Explicit ordered child pointers: in the preorder layout a node's
    # left child is the next slot and the right child is the left
    # child's escape link (thread_tree sets a left child's escape to its
    # right sibling's slot).
    internal = np.nonzero(~is_leaf)[0]
    lc = internal + 1
    rc = miss[lc]
    cenn = (node_mn + node_mx) * 0.5
    d = cenn[rc] - cenn[lc]
    axis = np.abs(d).argmax(1)
    swap = d[np.arange(len(internal)), axis] < 0
    out[6, internal] = np.where(swap, rc, lc)
    out[7, internal] = np.where(swap, lc, rc)
    out[8, internal] = axis

    # stack bound: depth of the tree (the walk holds ≤ depth+1 entries);
    # preorder guarantees parents precede children.
    depth = np.zeros(m, np.int64)
    depth[0] = 1
    for s in range(m):
        if not is_leaf[s]:
            l_ = int(out[6, s])
            r_ = int(out[7, s])
            depth[l_] = depth[s] + 1
            depth[r_] = depth[s] + 1
    maxd = int(depth.max())
    assert maxd + 1 < STACK_CAP, (maxd, STACK_CAP)
    return np.ascontiguousarray(out)


def _front_to_back(tab: np.ndarray, mn2: np.ndarray, mx2: np.ndarray,
                   eye, csize: int = None, pad_col=None) -> tuple:
    """Reorder a kind's primitive table in CLUSTER blocks so clusters are
    visited nearest-the-eye first, and return (tab, cluster_bounds).

    The linear scan tests clusters in storage order; nearest-first makes
    best_t tighten early so occluded distant clusters fail the
    better-than-best slab test for every lane (ordered culling — the role
    of front-to-back traversal in the reference's OptiX BVH).  Blocks are
    padded to a CLUSTER multiple with invalid columns so block
    permutation preserves the lo = ci*CLUSTER indexing.  Correctness does
    not depend on the order (strict < + ordinal tie-break)."""
    csize = csize or CLUSTER
    eye = np.asarray(eye, np.float64)
    n = tab.shape[1]
    pad = (-n) % csize
    if pad:
        # pad columns must be NEVER-HIT geometry (see pack_scene_tables:
        # zeros suffice for quads/triangles; spheres need r2 = -1 via
        # pad_col); their cluster boxes are inverted below either way.
        if pad_col is None:
            padcols = np.zeros((tab.shape[0], pad), np.float32)
        else:
            padcols = np.tile(np.asarray(pad_col, np.float32)[:, None],
                              (1, pad))
        tab = np.concatenate([tab, padcols], axis=1)
        mn2 = np.concatenate([mn2, np.ones((pad, 3))])
        mx2 = np.concatenate([mx2, -np.ones((pad, 3))])
    n_cl = tab.shape[1] // csize
    emn = np.minimum(mn2, mx2).reshape(n_cl, csize, 3)
    emx = np.maximum(mn2, mx2).reshape(n_cl, csize, 3)
    lo = emn.min(1)
    hi = emx.max(1)
    # distance from eye to each cluster's effective box
    d = np.maximum(np.maximum(lo - eye, eye - hi), 0.0)
    order = np.argsort(np.linalg.norm(d, axis=1), kind="stable")
    blocks = tab.reshape(tab.shape[0], n_cl, csize)[:, order, :]
    tab = np.ascontiguousarray(blocks.reshape(tab.shape[0], -1))
    mn2 = mn2.reshape(n_cl, csize, 3)[order].reshape(-1, 3)
    mx2 = mx2.reshape(n_cl, csize, 3)[order].reshape(-1, 3)
    return tab, _cluster_bounds(mn2, mx2, csize)


#: Streamed big-mesh path: above this many triangles the flat-triangle
#: table cannot be VMEM-resident (N x 128 x 4B rows exceed the ~16 MiB
#: budget alongside the ray planes around ~25-30k), so the packer
#: switches to chunk-aligned SAH leaves DMA'd from HBM on entry.
STREAM_THRESHOLD = int(_os.environ.get("PRT_STREAM_THRESHOLD", "24576"))
#: triangles per streamed chunk (= max top-leaf span; the DMA block is
#: STREAM_CHUNK + STREAM_NODE_ROWS HBM rows)
STREAM_CHUNK = int(_os.environ.get("PRT_STREAM_CHUNK", "128"))
#: rows per chunk reserved for the chunk's IN-BLOCK mini-tree (r5): the
#: SMEM top tree stops at chunk granularity (SMEM is ~1 MiB — a fine-
#: leaf tree over ~1M triangles cannot live there), and each DMA'd
#: chunk carries its own threaded sub-tree in its trailing rows, so the
#: kernel tests ~STREAM_SUB triangles per entered sub-leaf instead of
#: the whole 128-triangle chunk (the round-4 path's dominant cost).
#: 0 = auto (chunk // 4, the measured sweet spot: smaller DMA blocks
#: win — 320k row 579 -> ~497 ms — bounded below by mini-tree fit)
STREAM_NODE_ROWS = int(_os.environ.get("PRT_STREAM_NODE", "0"))
#: mini-tree leaf size (triangles per in-chunk sub-leaf)
STREAM_SUB = int(_os.environ.get("PRT_STREAM_SUB", "8"))


def _mini_threaded_tree(mn: np.ndarray, mx: np.ndarray, leaf: int,
                        group: int = 1):
    """Full-sweep-SAH threaded mini-tree over one chunk's (<= align)
    primitives -> (perm_local, (8, M) table in the _cluster_tree layout,
    lo*64+span leaf encoding).  Per node: sort on each axis, prefix/
    suffix box areas via vectorized min/max-accumulate, exact SAH cost
    at EVERY split position (a sweep build — finer than 16-bin binning
    at this micro scale), pick the best axis/position.  ~10x cheaper
    host time than the recursive binned builder (measured: the mini-tree
    pass dominated canonical-scale packing — 50 s per 320k triangles —
    and is ~2 s with this), with equal walk quality (TPU A/B in
    benchmarks/RESULTS.md).

    With group > 1 (the PACKED-row layout: `group` triangles share one
    128-lane scratch row at static lane offsets): the build partitions
    GROUPS of `group` consecutive input primitives as indivisible units
    — leaves are whole groups, so every leaf's slot range is group-
    aligned and the kernel's per-row multi-triangle fold needs no
    dynamic lane indexing.  perm_local then has group-padded length
    (pads = -1 -> zero attr rows: never-hit), lo/span are SLOT ranges,
    and leaf holds <= leaf slots."""
    n = len(mn)
    if group > 1:
        ng = -(-n // group)
        gm = np.full((ng * group,), -1, np.int64)
        gm[:n] = np.arange(n)
        gids = gm.reshape(ng, group)
        # masked group unions (pads excluded)
        gmn = np.full((ng, group, 3), np.inf)
        gmx = np.full((ng, group, 3), -np.inf)
        valid = gids >= 0
        gmn[valid] = mn[gids[valid]]
        gmx[valid] = mx[gids[valid]]
        sub_perm, tab = _mini_threaded_tree(
            gmn.min(1), gmx.max(1), max(1, leaf // group))
        # expand group perm/encodings back to slots
        perm = gids[sub_perm].reshape(-1)
        enc = tab[7]
        is_leaf = enc >= 0
        lo = (enc[is_leaf].astype(np.int64) >> 6) * group
        sp = (enc[is_leaf].astype(np.int64) & 63) * group
        tab = tab.copy()
        tab[7, is_leaf] = (lo * 64 + sp).astype(np.float32)
        return perm, tab
    cen = (mn + mx) * 0.5
    perm_out: list = []

    def area_lr(bmn_s, bmx_s):
        """Prefix and suffix surface areas of a sorted box list."""
        pmn = np.minimum.accumulate(bmn_s)
        pmx = np.maximum.accumulate(bmx_s)
        smn = np.minimum.accumulate(bmn_s[::-1])[::-1]
        smx = np.maximum.accumulate(bmx_s[::-1])[::-1]
        d1 = np.maximum(pmx - pmn, 0.0)
        d2 = np.maximum(smx - smn, 0.0)
        a1 = d1[:, 0] * d1[:, 1] + d1[:, 1] * d1[:, 2] \
            + d1[:, 2] * d1[:, 0]
        a2 = d2[:, 0] * d2[:, 1] + d2[:, 1] * d2[:, 2] \
            + d2[:, 2] * d2[:, 0]
        return a1, a2

    def build(ids):
        """Returns this subtree's column list [(bmn, bmx, enc[, left
        size])] in preorder; enc = -1.0 marks internal."""
        sel = mn[ids] <= mx[ids]
        if sel.all():
            bmn = mn[ids].min(0)
            bmx = mx[ids].max(0)
        else:  # group pads carry inverted boxes; exclude from bounds
            ok = sel.all(1)
            bmn = mn[ids[ok]].min(0) if ok.any() else np.ones(3)
            bmx = mx[ids[ok]].max(0) if ok.any() else -np.ones(3)
        if len(ids) <= leaf:
            lo = len(perm_out)
            perm_out.extend(ids.tolist())
            return [(bmn, bmx, float(lo * 64 + len(ids)))]
        k = len(ids)
        best = None  # (cost, order, split)
        counts = np.arange(1, k, dtype=np.float64)
        for ax in range(3):
            order = np.argsort(cen[ids, ax], kind="stable")
            a1, a2 = area_lr(mn[ids[order]], mx[ids[order]])
            cost = a1[:-1] * counts + a2[1:] * (k - counts)
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (cost[j], order, j + 1)
        _, order, half = best
        left = build(ids[order[:half]])
        right = build(ids[order[half:]])
        return [(bmn, bmx, -1.0, len(left))] + left + right

    tree = build(np.arange(n, dtype=np.int64))
    m = len(tree)
    out = np.zeros((8, m), np.float32)
    # escape links, preorder threading: left child escapes to its right
    # sibling's slot, right child (and leaves) escape like the parent.
    esc = np.full(m, -1, np.int64)

    def link(i, e):
        esc[i] = e
        node = tree[i]
        if node[2] < 0:  # internal: left at i+1, right after left's size
            right_at = i + 1 + node[3]
            link(i + 1, right_at)
            link(right_at, e)

    link(0, -1)
    for i, node in enumerate(tree):
        out[:3, i] = node[0]
        out[3:6, i] = node[1]
        out[6, i] = esc[i]
        out[7, i] = node[2] if node[2] >= 0 else -1.0
    return np.asarray(perm_out, np.int64), out


def _assemble_stream_blocks(tri: np.ndarray, perm: np.ndarray,
                            tree: np.ndarray, mn: np.ndarray,
                            mx: np.ndarray,
                            chunk: int = None, node_rows: int = None,
                            sub: int = None, pack: int = None):
    """Streamed big-mesh HBM layout (r5): per-chunk blocks of
    (chunk // pack + node_rows) rows x 128 lanes; returns (blocks, pack).

    Rows [0, chunk/pack): the chunk's triangles, `pack` per 128-lane
    row at static lane offsets k*(128/pack) — a 27-attr triangle wastes
    101 lanes in the 1-per-row layout, and the DMA'd bytes were the
    measured bottleneck (~18 GB/frame on the 320k dragon row); packing
    4 per row quarters them.  Rows [chunk/pack, +Ml): the chunk's OWN
    threaded mini-tree ([mn3, mx3, miss, enc] in lanes 0-7), built over
    GROUPS of `pack` consecutive triangles (group-aligned leaves keep
    every lane offset static in the kernel fold), STREAM_SUB slots per
    leaf.  Triangle slots are reordered by the mini permutation — safe
    because the winner fold tie-breaks on the carried global ordinal
    row, not storage order (images stay bit-identical to the dense
    path).  Pad slots (grouping remainders) are zero rows: never-hit.

    The reference offloads exactly this granularity problem to OptiX's
    GAS builder + RT cores (optix/renderer.cpp:703-765); here the SMEM
    top tree finds the chunk, the DMA'd block carries its own fine
    structure."""
    chunk = STREAM_CHUNK if chunk is None else chunk
    node_rows = STREAM_NODE_ROWS if node_rows is None else node_rows
    sub = STREAM_SUB if sub is None else sub
    n_attr = tri.shape[0]
    assert n_attr <= LANES
    if pack is None:
        pack = 4 if n_attr <= 32 else (2 if n_attr <= 64 else 1)
    while chunk % pack:
        pack //= 2
    stride = LANES // pack
    tri_rows = chunk // pack
    block = tri_rows + node_rows
    mult = 1 << int(np.ceil(np.log2(chunk + 1)))
    leaves = tree[7][tree[7] >= 0].astype(np.int64)
    chunks = leaves // mult
    spans = leaves % mult
    n_chunks = (len(perm) + chunk - 1) // chunk
    out = np.zeros((n_chunks * block, LANES), np.float32)
    for c, span in zip(chunks, spans):
        span = int(span)
        if span == 0:
            continue
        ids = perm[c * chunk: c * chunk + span]
        assert (ids >= 0).all(), "leaf runs hold only real primitives"
        # mini-tree with leaf-size fallback until it fits node_rows
        mtab = None
        for s in (sub, 2 * sub, 4 * sub):
            if s >= 64:
                break
            mperm, cand = _mini_threaded_tree(mn[ids], mx[ids], s,
                                              group=pack)
            if cand.shape[1] <= node_rows:
                mtab = cand
                ids = np.where(mperm >= 0, ids[mperm], -1)
                break
        if mtab is None:
            # chained fat leaves (always fits: <= ceil(chunk/48) cols);
            # 48 is a pack multiple for every supported pack.  Pad the
            # slot list first so every leaf's slot range is pack-aligned
            # (pad slots are zero rows: never-hit).
            ids = np.concatenate(
                [ids, np.full((-len(ids)) % pack, -1, np.int64)])
            span_p = len(ids)
            segs = [(lo, min(48, span_p - lo))
                    for lo in range(0, span_p, 48)]
            mtab = np.zeros((8, len(segs)), np.float32)
            for k, (lo, sp) in enumerate(segs):
                real = ids[lo:lo + sp]
                real = real[real >= 0]
                mtab[:3, k] = mn[real].min(0)
                mtab[3:6, k] = mx[real].max(0)
                mtab[6, k] = k + 1 if k + 1 < len(segs) else -1.0
                mtab[7, k] = lo * 64 + sp
        base = c * block
        # packed triangle rows: slot s -> row s // pack, lanes
        # [(s % pack) * stride, +n_attr); pad slots (-1) stay zero
        cols = np.zeros((n_attr, len(ids)), np.float32)
        real = ids >= 0
        cols[:, real] = tri[:, ids[real]]
        n_slots = len(ids)
        assert n_slots % pack == 0 and n_slots // pack <= tri_rows
        blk = cols.T.reshape(n_slots // pack, pack, n_attr)
        for p in range(pack):
            out[base: base + n_slots // pack,
                p * stride: p * stride + n_attr] = blk[:, p, :]
        ml = mtab.shape[1]
        assert ml <= node_rows
        out[base + tri_rows: base + tri_rows + ml, :8] = mtab.T
    return out, pack

# Cluster count above which "auto" picks the BVH walk over the linear
# scan for a kind.  With the binned-SAH build (exact leaf bounds) the
# tree beats the linear scan already at sphere-headline scale (51
# clusters: 258 vs 310 ms, RESULTS.md), so auto prefers the tree for
# anything beyond a handful of clusters; sub-threshold kinds keep the
# front-to-back linear scan whose per-cluster slab test is cheaper than
# a walk over a 3-node tree.
TREE_THRESHOLD = int(_os.environ.get("PRT_TREE_THRESHOLD", "4"))

#: Bounce-0 frustum pretest (VERDICT r4 item 2a): scalar interval
#: certain-miss gate ahead of each vector slab test on the coherent
#: camera bundle; identical traversal results (conservative gate).
FRUSTUM0 = int(_os.environ.get("PRT_FRUSTUM0", "1"))

#: NEE shadow rays as an ANY-HIT walk (VERDICT r4 item 2b): seed the
#: shadow fold with the light's own hit so any occluder resolves the
#: lane immediately and beyond-light nodes are culled; bit-identical
#: visibility to the closest-hit formulation (0 restores it).
NEE_ANYHIT = int(_os.environ.get("PRT_NEE_ANYHIT", "1"))


def pack_scene_tables(scene: SceneData, accel: str = "auto", eye=None,
                      tail_csize: int = None):
    """Returns (sph_tab, quad_tab, tri_tab, sph_acc, quad_acc, tri_acc,
    mats, tail_roots, eye_used) float32 host arrays; tail_roots = per-kind
    fine-view root columns for the straggler-tail walk (TAIL_CLUSTER;
    -1 = none); eye_used = True iff some kind's table actually depends on
    the eye (a linear-scan kind took the front-to-back ordering) — False
    lets callers skip camera-move repacks entirely (SAH/tree tables are
    camera-independent).
    Primitives of each kind are sorted by the Morton
    code of their AABB centroid so consecutive runs of CLUSTER primitives
    are spatially tight; *_acc is the per-kind acceleration table the
    kernel culls with — "tree" builds a binned-SAH threaded escape-link
    BVH with exact leaf bounds ((8, M) layout; columns permute into
    leaf order, invalid primitives excluded from every leaf run);
    "ktree" the pre-SAH Karras-over-Morton-runs tree (kept for A/B);
    "ordered" an explicit-pointer BVH walked near-child-first ((10, M)
    _cluster_stack_tree layout — measured a WASH vs the threaded tree:
    the whole-tile any-lane entry rule erases per-ray front-to-back
    gains, RESULTS.md); "linear" keeps each run's union AABB plus a
    root pretest column ((6, n_cl + 1)), scanned with one
    scalar-predicated slab test per cluster; "auto" (default) picks per
    kind by cluster count (TREE_THRESHOLD).  The kernel dispatches on
    shape[0], so all are drop-in.

    sph_tab  (6, Ns):  cx cy cz r2 mid ord
    quad_tab (14, Nq): n(3) cn us(3) cu vs(3) cv mid ord
    tri_tab  (27, Nt): ng(3) p0ng e1(3) e2(3) e2xp0(3) p0xe1(3) mid ord
                       n0(3) n1(3) n2(3)
    There is NO per-primitive valid flag: invalid/padding primitives are
    encoded as never-hit geometry (sphere r2 = -1, quad zero-normal +
    out-of-extent centers, triangle zero geometric normal), so the hot
    test bodies skip the flag read and mask entirely.
    mats     (5, Nm):  mtype c(3) extra — a compressed material record
                       exploiting BSDF exclusivity: c carries EMISSION for
                       emissive materials (their attenuation is never used:
                       the path terminates) and ALBEDO otherwise (dielectric
                       attenuation is identity and ignored); extra carries
                       roughness for metal, IoR for dielectric, 1.0
                       otherwise.  4 fewer fold selects + 4 fewer scalar
                       reads per tested primitive.

    mid indexes the shared material table (the TPU form of the reference's
    dedup handle remap, cuda_megakernel/renderer.cu:282-344): one level of
    SMEM indirection replaces 8 per-primitive scalar reads.  ord is the
    GLOBAL
    primitive ordinal (kind offset + within-kind index; spheres then quads
    then triangles) — the shared tie-break convention with ops/intersect.py
    and accel/lbvh.py realizing the reference's first-wins scan for
    coplanar equal-t hits (primitive.cpp:42-48).
    """
    from parallelraytracing_tpu.accel.lbvh import morton3d
    from parallelraytracing_tpu.core import geometry as geo
    if tail_csize is None:
        tail_csize = TAIL_CLUSTER
    mt = np.asarray(scene.mat_type, np.float32)
    alb = np.asarray(scene.mat_albedo, np.float32)
    emit = np.asarray(scene.mat_emit, np.float32)
    rough = np.asarray(scene.mat_rough, np.float32)
    ior = np.asarray(scene.mat_ior, np.float32)

    mc = np.where((mt == MAT_EMISSIVE)[:, None], emit, alb)
    extra = np.where(mt == MAT_METAL, rough,
                     np.where(mt == MAT_DIELECTRIC, ior, 1.0))
    mats = np.stack([
        mt, mc[:, 0], mc[:, 1], mc[:, 2], extra], axis=0).astype(np.float32)

    def mat_cols(ids):
        return np.asarray(ids, np.float32)[None]

    def morton_order(mn, mx):
        cen = (mn + mx) * 0.5
        lo = cen.min(0)
        ext = np.maximum(cen.max(0) - lo, 1e-12)
        return np.argsort(morton3d((cen - lo) / ext), kind="stable")

    n_sph_full = int(np.asarray(scene.sph_valid).shape[0])
    n_quad_full = int(np.asarray(scene.quad_valid).shape[0])
    eye_used = [False]  # set by accelerate's front-to-back branch

    def accelerate(tab, cl, mn2, mx2, n, csize=None, pad_col=None,
                   tail_csize=0, clip_verts=None):
        """Per-kind acceleration-table choice (see docstring).  Returns
        (tab, acc_table, tail_root) — tail_root is the fine view's root
        column for the straggler-tail walk (-1 when absent)."""
        csize = csize or CLUSTER
        if accel == "ordered":
            return tab, _cluster_stack_tree(cl, n, csize), -1
        if accel == "ktree":   # Karras-over-Morton-runs (the pre-SAH tree)
            return tab, _cluster_tree(cl, n, csize), -1
        if accel == "tree" or (accel == "auto"
                               and cl.shape[1] > TREE_THRESHOLD):
            if tail_csize:
                perm, tree, troot = _sah_threaded_tree(
                    mn2, mx2, csize, tail_csize,
                    collapse_tau=COLLAPSE_TAU,
                    collapse_abs=COLLAPSE_ABS, tile_k=TILE_SAH_K)
                return np.ascontiguousarray(tab[:, perm]), tree, troot
            perm, tree = _sah_threaded_tree(
                mn2, mx2, csize, sbvh_alpha=SBVH_ALPHA,
                clip_verts=clip_verts, collapse_tau=COLLAPSE_TAU,
                collapse_abs=COLLAPSE_ABS, tile_k=TILE_SAH_K)
            return np.ascontiguousarray(tab[:, perm]), tree, -1
        if eye is not None and cl.shape[1] > 1:
            eye_used[0] = True
            tab, cl = _front_to_back(tab, mn2, mx2, eye, csize, pad_col)
            return tab, _append_root(cl, mn2, mx2), -1
        return tab, _append_root(cl, mn2, mx2), -1

    def _append_root(cl, mn2, mx2):
        """Append the kind's union (root) AABB as the LAST column of a
        linear cluster table: one scalar-predicated slab test lets a
        bounce whose rays all miss the kind (sky-bound tail) skip every
        per-cluster test — the root-exit the tree walks get for free.
        The kernel indexes it at the static cluster count; excluded
        (invalid-padded) primitives carry inverted boxes and are left
        out of the union."""
        valid = (mn2 <= mx2).all(1)
        root = np.zeros((6, 1), np.float32)
        if valid.any():
            root[:3, 0] = mn2[valid].min(0)
            root[3:, 0] = mx2[valid].max(0)
        else:
            root[:3, 0] = 1.0
            root[3:, 0] = -1.0
        return np.concatenate([cl, root], axis=1)

    c = np.asarray(scene.sph_center, np.float32)
    r = np.asarray(scene.sph_radius, np.float32)
    sv = np.asarray(scene.sph_valid)
    s_mn, s_mx = geo.sphere_aabb(c.astype(np.float64), r.astype(np.float64))
    s_ord = morton_order(s_mn, s_mx)
    c, r, sv = c[s_ord], r[s_ord], sv[s_ord]
    # Invalid primitives are encoded as NEVER-HIT GEOMETRY instead of a
    # carried valid flag (saves a scalar read + 2 vector ops per test):
    # r2 = -1 makes the sphere discriminant provably negative
    # (|d.oc|^2 <= |oc|^2 < |oc|^2 + 1).
    r2 = np.where(sv, r * r, -1.0).astype(np.float32)
    sph = np.concatenate([
        c.T, r2[None],
        mat_cols(np.asarray(scene.sph_mat)[s_ord]),
        s_ord.astype(np.float32)[None]], axis=0)
    # invalid pads get inverted boxes so their cluster test can't pass
    s_mn2 = np.where(sv[:, None], s_mn[s_ord], np.float64(1.0))
    s_mx2 = np.where(sv[:, None], s_mx[s_ord], np.float64(-1.0))
    sph, sph_cl, sph_troot = accelerate(
        sph, _cluster_bounds(s_mn2, s_mx2), s_mn2, s_mx2, len(sv),
        pad_col=np.array([0, 0, 0, -1, 0, 0]), tail_csize=tail_csize)

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
    # Invalid quads: zero normal fails |d.n| >= 1e-8 and cu/cv = 2 fails
    # the extent test — never-hit without a valid flag.
    qm = qvd[:, None]
    qn = np.where(qm, qn, 0.0)
    us = np.where(qm, us, 0.0)
    vs = np.where(qm, vs, 0.0)
    cn = np.where(qvd, cn, 0.0)
    cu = np.where(qvd, cu, 2.0)
    cv = np.where(qvd, cv, 2.0)
    quad = np.concatenate([
        qn.T, cn[None], us.T, cu[None], vs.T, cv[None],
        mat_cols(np.asarray(scene.quad_mat)[q_ord]),
        (q_ord + n_sph_full).astype(np.float32)[None]], axis=0)
    q_mn2 = np.where(qvd[:, None], q_mn[q_ord], np.float64(1.0))
    q_mx2 = np.where(qvd[:, None], q_mx[q_ord], np.float64(-1.0))
    quad, quad_cl, quad_troot = accelerate(
        quad, _cluster_bounds(q_mn2, q_mx2), q_mn2, q_mx2, len(qvd),
        tail_csize=tail_csize)

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
    # Invalid triangles: zero geometric normal makes div == 0 -> miss.
    ng = np.where(tvd[:, None], ng, 0.0)
    p0ng = np.where(tvd, p0ng, 0.0)
    # HOT rows (0-15: the per-test geometry) lead; COLD rows (16-26:
    # mid, ord, vertex normals — read only at fold time) trail, so the
    # hot half can live in SMEM while the rest rides VMEM rows (the
    # hot/cold split; 16 avoids the pad-to-24 an 18-row window costs).
    tri_rows = [
        ng.T, p0ng[None], e1.T, e2.T, e2xp0.T, p0xe1.T,
        mat_cols(np.asarray(scene.tri_mat)[t_ord]),
        (t_ord + n_sph_full + n_quad_full).astype(np.float32)[None],
        np.asarray(scene.tri_n0, np.float32)[t_ord].T,
        np.asarray(scene.tri_n1, np.float32)[t_ord].T,
        np.asarray(scene.tri_n2, np.float32)[t_ord].T]
    if getattr(scene, "tri_uv0", None) is not None:
        # rows 27-32 (u0 v0 u1 v1 u2 v2): barycentric texcoord sources
        # for the in-kernel image-texture path (image scenes only)
        tri_rows += [np.asarray(scene.tri_uv0, np.float32)[t_ord].T,
                     np.asarray(scene.tri_uv1, np.float32)[t_ord].T,
                     np.asarray(scene.tri_uv2, np.float32)[t_ord].T]
    tri = np.concatenate(tri_rows, axis=0)
    t_mn2 = np.where(tvd[:, None], t_mn[t_ord], np.float64(1.0))
    t_mx2 = np.where(tvd[:, None], t_mx[t_ord], np.float64(-1.0))
    tri_stream = 0
    tri_pack = 1
    tri_snode = 0
    if (len(tvd) > STREAM_THRESHOLD and accel in ("auto", "tree")):
        # Streamed big-mesh path (see _sah_threaded_tree align doc +
        # _assemble_stream_blocks): chunk-aligned SAH top leaves, each
        # chunk a self-describing HBM block (triangle rows + its own
        # mini-tree rows) the kernel DMAs on entry.  Pad entries inside
        # blocks are zero rows (ng = 0 fails div_ok: never hit).
        # Auto chunk/node selection (r5 sweep: smaller blocks are
        # strictly faster — 64/16 = 497 ms vs 128/64 = 579 on the 320k
        # row — but the SMEM top tree grows as 1/chunk, so pick the
        # SMALLEST chunk whose tree + scratch fit the SMEM budget
        # alongside the tables already built.  Env overrides pin both.
        committed = sum(smem_padded_bytes(np.asarray(a).shape)
                        for a in (sph, quad, sph_cl, quad_cl, mats))
        committed += 16 * 1024  # lights/inst/loop-state reserve
        n_attr_t = tri.shape[0]
        pack_g = 4 if n_attr_t <= 32 else (2 if n_attr_t <= 64 else 1)
        # env-set or monkeypatched (non-default) chunk sizes PIN the
        # choice; the default activates smallest-that-fits auto mode
        pinned = ("PRT_STREAM_CHUNK" in _os.environ
                  or STREAM_CHUNK != 128)
        chunks_try = [STREAM_CHUNK] if pinned else [64, 128, 256, 512]
        # 40 KB headroom for the stream decision (measured: the 1.28M
        # dragon's 848 KB tree + 96 KB scratch compiles with ~77 KB of
        # real slack — the general 96 KB guard would push it to the
        # slower 256-chunk config for nothing)
        _stream_hr = 40 * 1024
        for tri_stream in chunks_try:
            # node rows: chunk//4 at small chunks (64/16 measured best
            # on the 320k row), chunk//2 at >=128 (tight node budgets
            # force fat sub-16 mini leaves at canonical scale — 128/32
            # measured 888 vs 128/64's 847 ms on the 1.28M dragon)
            node_rows = STREAM_NODE_ROWS or (
                max(16, tri_stream // 4) if tri_stream <= 64
                else tri_stream // 2)
            perm, tree = _sah_threaded_tree(
                t_mn2, t_mx2, tri_stream, align=tri_stream,
                collapse_tau=COLLAPSE_TAU, collapse_abs=COLLAPSE_ABS,
                tile_k=TILE_SAH_K)
            block = tri_stream // pack_g + node_rows
            scr_b = 2 * block * LANES * 4 + 64  # two slots + state
            tree_b = smem_padded_bytes(tree.shape)
            if (committed + tree_b + scr_b + _stream_hr <= SMEM_BYTES
                    or tri_stream == chunks_try[-1]):
                break
        tri, tri_pack = _assemble_stream_blocks(
            tri, perm, tree, t_mn2, t_mx2, chunk=tri_stream,
            node_rows=node_rows)
        tri_snode = node_rows
        tri_cl = tree
        tri_troot = -1
    else:
        tri, tri_cl, tri_troot = accelerate(
            tri, _cluster_bounds(t_mn2, t_mx2, TRI_CLUSTER),
            t_mn2, t_mx2, len(tvd), TRI_CLUSTER,
            clip_verts=(v0.astype(np.float64), v1.astype(np.float64),
                        v2.astype(np.float64)))

    return (np.ascontiguousarray(sph), np.ascontiguousarray(quad),
            np.ascontiguousarray(tri), sph_cl, quad_cl, tri_cl,
            np.ascontiguousarray(mats), (sph_troot, quad_troot, tri_troot),
            eye_used[0], tri_stream, tri_pack, tri_snode)


#: largest per-axis image-texture size the Pallas kernels accept: the
#: per-lane texel fetch is a static row loop (cost ∝ texels/128), so
#: textures are bounded; larger atlases keep the jnp-engine route.
#: r5: raised 64 -> 128 with the measured per-row fetch cost in
#: benchmarks/RESULTS.md (the bound is fetch COST, not memory).
KTEX_MAX = int(_os.environ.get("PRT_KERNEL_TEX_MAX", "128"))


def _fit_atan_coeffs(deg: int = 8) -> tuple:
    """Least-squares fit of atan(t)/t as a polynomial in t^2 on [0,1]
    (dense sampling; deterministic).  Max |error| of the resulting
    atan(t) ~ 4e-8 rad at deg 8 — far below a texel at any supported
    atlas size.  Fitted once at import; the kernel evaluates the odd
    polynomial with a static Horner chain (VPU mul/add only)."""
    t = np.linspace(0.0, 1.0, 4001)[1:]
    y = np.arctan(t) / t
    v = np.vander(t * t, deg + 1, increasing=True)
    co, *_ = np.linalg.lstsq(v, y, rcond=None)
    return tuple(float(c) for c in co)


_ATAN_CO = _fit_atan_coeffs()


def vpu_atan2(z, x):
    """atan2 via octant reduction + odd minimax-ish polynomial — only
    select/abs/min/max/mul/add/div (all VPU-lowerable; Mosaic has no
    transcendental atan).  Matches jnp.arctan2 to ~1e-7 rad; the
    in-kernel sphere equirect UV path (the hole VERDICT r4 item 5
    names) needs exactly this."""
    ax = jnp.abs(x)
    az = jnp.abs(z)
    num = jnp.minimum(ax, az)
    den = jnp.maximum(ax, az)
    t = num / jnp.maximum(den, 1e-30)
    t2 = t * t
    p = jnp.float32(_ATAN_CO[-1])
    for c in _ATAN_CO[-2::-1]:
        p = p * t2 + jnp.float32(c)
    p = p * t
    p = jnp.where(az > ax, jnp.float32(0.5 * np.pi) - p, p)
    p = jnp.where(x < 0.0, jnp.float32(np.pi) - p, p)
    return jnp.where(z < 0.0, -p, p)


def vpu_asin(y):
    """asin on [-1,1] through vpu_atan2 (same VPU-only op set)."""
    return vpu_atan2(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))


def pack_kernel_textures(scene: SceneData):
    """In-kernel image-texture tables from a host SceneData.

    Returns (itex, rows):
    - itex: static per-textured-material tuple
      ((mat_id, row_offset, th, tw), ...) baked into the kernel;
    - rows: (R, 128) f32 — each texture u8-quantized and packed
      r*65536 + g*256 + b (exact integers < 2^24), texels row-major,
      128 per table row.

    Raises NotImplementedError outside the kernel envelope: a texture
    larger than KTEX_MAX per axis (fetch cost is a static row loop —
    bounded by design; big atlases keep the jnp route).  Textured
    SPHERES run in-kernel since r5: the deferred equirect UV is
    computed post-fold from the carried center via vpu_atan2/vpu_asin
    (select+polynomial forms — Mosaic lowers no transcendentals)."""
    from parallelraytracing_tpu.ops.textures import TEX_IMAGE_BASE
    mat_tex = np.asarray(scene.mat_tex)
    atlas = np.asarray(scene.tex_atlas)
    size = np.asarray(scene.tex_size)
    row_chunks = []
    tex_off = {}
    itex = []
    off = 0
    for mid, tex in enumerate(mat_tex):
        if tex < TEX_IMAGE_BASE:
            continue
        tid = int(tex - TEX_IMAGE_BASE)
        th, tw = int(size[tid, 0]), int(size[tid, 1])
        if th > KTEX_MAX or tw > KTEX_MAX:
            raise NotImplementedError(
                f"image texture {tid} is {th}x{tw} — the in-kernel "
                f"path is bounded at {KTEX_MAX}x{KTEX_MAX} "
                f"(PRT_KERNEL_TEX_MAX); larger atlases keep the "
                f"jnp-engine route.")
        if tid not in tex_off:
            img = np.clip(np.round(atlas[tid, :th, :tw] * 255.0),
                          0.0, 255.0)
            packed = (img[..., 0] * 65536.0 + img[..., 1] * 256.0
                      + img[..., 2]).reshape(-1)
            pad = (-len(packed)) % LANES
            if pad:
                packed = np.concatenate([packed, np.zeros(pad)])
            rows = packed.reshape(-1, LANES).astype(np.float32)
            tex_off[tid] = off
            row_chunks.append(rows)
            off += rows.shape[0]
        itex.append((float(mid), int(tex_off[tid]), th, tw))
    return tuple(itex), np.concatenate(row_chunks, axis=0)


def pack_lights_table(scene: SceneData) -> np.ndarray:
    """(28, Nl) f32 light table for in-kernel NEE: [kind, global ord,
    center(3), radius, u(3), v(3), normal(3), emit(3)] per samplable
    emissive primitive (ops/nee.extract_lights enumeration), plus the
    PACKED-TEST rows 18-27 [cn, us(3), cu, vs(3), cv, r2] — the light's
    own quad-plane / sphere-quadratic constants computed with the IDENT-
    ICAL f32 host arithmetic as pack_scene_tables, so the any-hit shadow
    walk's analytically seeded light-hit t is bit-equal to the t the
    closest-hit fold would have computed for the light primitive (the
    equal-t/ordinal tie semantics on coplanar geometry — the reference's
    Cornell ceiling/light overlap — are preserved exactly).  Returns a
    (28, 1) zero dummy when the scene has none (n_lights=0 disables the
    kernel block)."""
    from parallelraytracing_tpu.ops.nee import extract_lights
    L = extract_lights(scene)
    if L is None:
        return np.zeros((28, 1), np.float32)
    kind = np.asarray(L.kind)
    idx = np.asarray(L.idx)
    n_sph_full = int(np.asarray(scene.sph_valid).shape[0])
    ordv = np.where(kind == KIND_SPHERE, idx, n_sph_full + idx)
    lc = np.asarray(L.center, np.float32)
    lr = np.asarray(L.radius, np.float32)
    lu = np.asarray(L.u, np.float32)
    lv = np.asarray(L.v, np.float32)
    ln = np.asarray(L.normal, np.float32)
    # rows 18-27: same expressions as the quad/sphere table packing
    # (pack_scene_tables: us = qu/max(|qu|^2), cn = (qc*qn).sum(1), ...;
    # r2 = r*r) over the same f32 source arrays -> bit-equal constants.
    us = lu / np.maximum((lu * lu).sum(1, keepdims=True), 1e-30)
    vs = lv / np.maximum((lv * lv).sum(1, keepdims=True), 1e-30)
    cn = (lc * ln).sum(1)
    cu = (lc * us).sum(1)
    cv = (lc * vs).sum(1)
    r2 = lr * lr
    return np.concatenate([
        kind[None].astype(np.float32), ordv[None].astype(np.float32),
        lc.T, lr[None], lu.T, lv.T, ln.T,
        np.asarray(L.emit, np.float32).T,
        cn[None], us.T, cu[None], vs.T, cv[None], r2[None]], axis=0)


def pack_instance_tables(inst_meshes, instances, ord_base: float,
                         ordered: bool = False, with_uv: bool = False):
    """Host tables for in-kernel TLAS/BLAS instancing.

    inst_meshes: unique Mesh objects; instances: (mesh_index, material_id,
    4x4 world transform) records (Scene.instances); ord_base: first free
    global ordinal (tie-break ids beyond every flat primitive).

    Returns (itri (25 or 31, Nt), iacc (8, Mb), ibox (6, Ni),
    inst (24, Ni)):
    - itri: LOCAL-space triangle geometry concatenated across unique
      meshes, Morton-sorted in TRI_CLUSTER runs per mesh
      [ng(3) p0ng e1(3) e2(3) e2xp0(3) p0xe1(3) n0(3) n1(3) n2(3)];
      with_uv appends rows 25-30 [u0 v0 u1 v1 u2 v2] (mesh texcoords,
      zeros when absent) — the in-kernel image-texture path on
      INSTANCED materials (r5; was a jnp-only refusal);
    - iacc: per-mesh cluster-BVHs over the local triangles, concatenated
      with GLOBAL child/range indices; the threaded escape-link layout
      by default (miss -1 exits back to the TLAS), or the
      explicit-pointer near-first layout when ordered=True;
    - ibox: instance world AABBs (transformed local root corners);
    - inst: per instance [blas root, world->local affine (12, row-major
      3x4), local-normal->world matrix (9 = inv^T linear), material id,
      ordinal base]."""
    from parallelraytracing_tpu.accel.tlas import _mesh_local_arrays

    itri_cols = []
    iacc_cols = []
    mesh_root = []
    mesh_bbox = []
    mesh_ntri = []
    node_off = 0
    tri_off = 0
    for mesh in inst_meshes:
        v0, v1, v2, n0, n1, n2 = (a.astype(np.float64)
                                  for a in _mesh_local_arrays(mesh))
        mn = np.minimum(np.minimum(v0, v1), v2)
        mx = np.maximum(np.maximum(v0, v1), v2)
        cen = (mn + mx) * 0.5
        lo = cen.min(0)
        ext = np.maximum(cen.max(0) - lo, 1e-12)
        from parallelraytracing_tpu.accel.lbvh import morton3d
        order = np.argsort(morton3d((cen - lo) / ext), kind="stable")
        v0, v1, v2 = v0[order], v1[order], v2[order]
        n0, n1, n2 = n0[order], n1[order], n2[order]
        mn, mx = mn[order], mx[order]
        e1 = v1 - v0
        e2 = v2 - v0
        ng = np.cross(e1, e2)
        p0ng = (v0 * ng).sum(1)
        e2xp0 = np.cross(e2, v0)
        p0xe1 = np.cross(v0, e1)
        nt = len(v0)
        rows = [ng.T, p0ng[None], e1.T, e2.T, e2xp0.T, p0xe1.T,
                n0.T, n1.T, n2.T]
        if with_uv:
            tc = getattr(mesh, "texcoords", None)
            idx_ = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
            if tc is not None and len(tc):
                tc = np.asarray(tc, np.float64)
                uvs = [tc[idx_[:, k]][order] for k in range(3)]
            else:
                uvs = [np.zeros((nt, 2))] * 3
            rows += [u.T for u in uvs]
        tab = np.concatenate(rows, axis=0).astype(np.float32)
        cl = _cluster_bounds(mn, mx, TRI_CLUSTER)
        if ordered:
            # explicit-pointer layout: child columns shift by node_off,
            # leaf triangle ranges by tri_off (leaf marker row6 == -1).
            tree = _cluster_stack_tree(cl, nt, TRI_CLUSTER).copy()
            leaf = tree[6] < 0
            tree[6, ~leaf] += node_off
            tree[7, ~leaf] += node_off
            tree[7, leaf] += tri_off
            tree[8, leaf] += tri_off
        else:
            # binned-SAH BLAS (exact leaf bounds; tab columns permuted
            # into leaf order), then globalize: leaf runs shift by
            # tri_off (row 7 packs lo*64 + span, so lo shifts as
            # tri_off*64), miss links by node_off (-1 = exit the BLAS).
            # Globalization runs in int64 with an explicit f32-exactness
            # gate: beyond 2^24 the packed value would round silently and
            # corrupt leaf ranges (round-2 advisor finding).
            perm2, tree = _sah_threaded_tree(mn, mx, TRI_CLUSTER,
                                             collapse_tau=COLLAPSE_TAU,
                                             collapse_abs=COLLAPSE_ABS,
                                             tile_k=TILE_SAH_K)
            tab = np.ascontiguousarray(tab[:, perm2])
            tree = tree.copy()
            tree[6] = np.where(tree[6] >= 0, tree[6] + node_off, -1.0)
            leaf = tree[7] >= 0
            enc = tree[7, leaf].astype(np.int64) + np.int64(tri_off) * 64
            if enc.size and enc.max() >= (1 << 24):
                raise ValueError(
                    f"instance BLAS leaf encoding overflows f32 integer "
                    f"range: cumulative unique-mesh triangles "
                    f"{tri_off + nt} exceed the {1 << 18}-triangle packed "
                    f"cap (lo*64+span must stay < 2^24). Decimate or "
                    f"split the meshes.")
            tree[7, leaf] = enc.astype(np.float32)
        itri_cols.append(tab)
        iacc_cols.append(tree)
        mesh_root.append(node_off)
        mesh_bbox.append((mn.min(0), mx.max(0)))
        mesh_ntri.append(nt)
        node_off += tree.shape[1]
        tri_off += nt

    itri = np.ascontiguousarray(np.concatenate(itri_cols, axis=1))
    iacc = np.ascontiguousarray(np.concatenate(iacc_cols, axis=1))

    ibox = np.zeros((6, len(instances)), np.float32)
    inst = np.zeros((24, len(instances)), np.float32)
    for k, (mi, mid, m4) in enumerate(instances):
        m4 = np.asarray(m4, np.float64)
        inv = np.linalg.inv(m4)
        lo, hi = mesh_bbox[mi]
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1])
                            for z in (lo[2], hi[2])])
        wc = corners @ m4[:3, :3].T + m4[:3, 3]
        ibox[:3, k] = wc.min(0)
        ibox[3:, k] = wc.max(0)
        inst[0, k] = mesh_root[mi]
        inst[1:13, k] = inv[:3, :4].reshape(-1)
        inst[13:22, k] = inv[:3, :3].T.reshape(-1)
        inst[22, k] = mid
        inst[23, k] = ord_base + k * tri_off  # tri_off = total local tris
    return itri, iacc, ibox, inst


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
                      cluster_refs=None, mats_ref=None, lights_ref=None,
                      nee: bool = False, n_lights: int = 0,
                      inst_refs=None, n_inst: int = 0,
                      itri_vmem: bool = False, stack_ref=None,
                      stats_ref=None, tri_cold_get=None,
                      itri_cold_get=None,
                      tree_starts=(0, 0, 0),
                      tri_hot_get=None, tri_hot_n: int = 0,
                      checker: tuple = (),
                      tri_stream: int = 0, tri_stream_refs=None,
                      tri_hbm_ref=None, tri_pack: int = 1,
                      tri_snode: int = 0,
                      itex: tuple = (), itex_ref=None,
                      frustum0: bool = False):
    # Partial SMEM hot prefix (plan_table's large case) requires the
    # hot/cold split: the SMEM body reads ONLY hot lanes through it.
    assert tri_hot_get is None or tri_cold_get is not None
    assert not tri_stream or (tri_cold_get is None
                              and tri_hot_get is None)
    import jax.experimental.pallas as pl
    f0 = jnp.zeros(shape, jnp.float32)

    # Does any acceleration table use the ordered (10, M) layout?  Static:
    # decides whether majority-direction signs are computed per ray set.
    _acc_tabs = list(cluster_refs or ())
    if inst_refs is not None:
        _acc_tabs.append(inst_refs[1])
    ordered_any = any(t is not None and t.shape[0] == 10 for t in _acc_tabs)

    # t_max is static; at the default "infinite" horizon the upper-bound
    # compare is vacuous — drop it from every per-primitive test.
    tmax_inf = t_max >= 1e30

    def tcap(ok, t):
        return ok if tmax_inf else ok & (t <= t_max)

    def mat_of(mid):
        """Material constants via one SMEM indirection (mid is the f32
        material id column; ids are small integers, exact in f32).
        Returns (mtype, c0, c1, c2, extra, mid) — the compressed
        record (c = albedo or emission; extra = rough | ior | 1) plus the
        raw id (folded into the carry only on checker-textured scenes)."""
        mi = mid.astype(jnp.int32)
        return tuple(mats_ref[k, mi] for k in range(5)) + (mid,)

    def bounce_step(rng_d, state, depth=None):
        """state = (ox,oy,oz, dx,dy,dz, tr,tg,tb, rr,rg,rb, alive_f32)."""
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = state
        alive_b = alive > 0.0
        # NEE encodes "emission already sampled at the previous (diffuse)
        # vertex" as alive == 2 (keeps the cross-segment state at 13
        # planes).
        emit_w = jnp.where(alive > 1.5, 0.0, 1.0) if nee else 1.0

        def closest_hit(ox, oy, oz, dx, dy, dz, active_b, shadow=None,
                        frustum=False):
            """Full closest-hit fold of one ray set against the scene
            (camera/bounce rays AND shadow rays share this).

            shadow=(seed_t, seed_ord) switches to the ANY-HIT occlusion
            walk: the carry shrinks to (best_t, best_ord) seeded with
            the light's own hit, per-primitive bodies skip material /
            normal reads, and any beating primitive resolves its lane
            (best_t -> -BIG: excluded from all later slab pretests).
            Returns the 2-tuple carry; visibility = best_ord unchanged."""
            # Safe reciprocal directions for the cluster slab tests.
            eps = 1e-20
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps,
                                     jnp.where(dx < 0, -eps, eps), dx)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps,
                                     jnp.where(dy < 0, -eps, eps), dy)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps,
                                     jnp.where(dz < 0, -eps, eps), dz)

            # ---------------- closest hit fold over all primitives
            # The fold carries RAW winner geometry (sphere center / quad normal
            # / unnormalized interpolated triangle normal in gx,gy,gz) plus a
            # packed FLAGS plane (bit 0 front-face, bit 1 kind-is-sphere,
            # bits 2+ material type) and the compressed material record
            # (c0..c2, extra); the shading normal / flag decode happen ONCE
            # per bounce after the fold, so per-primitive bodies skip
            # hit-point, normal, and per-channel material math.
            # Dead lanes start at best_t = -BIG: every slab test's
            # better-than-best term then excludes them for free (no
            # explicit active mask in the hot per-node test).  Their fold
            # results are garbage but every consumer is alive-masked.
            # Extra carried planes on textured scenes only (untextured
            # scenes compile them away): the winning material id (slot
            # 10, checker OR image textures) and the winner's surface
            # UV (slots 11-12, image textures — each body passes its
            # FINAL uv so no per-kind decode is needed post-fold;
            # spheres are never image-textured in-kernel: no
            # atan2/asin lowering on the VPU, builder-enforced).
            need_mid = (bool(checker) or bool(itex)) and shadow is None
            need_uv = bool(itex) and shadow is None
            if shadow is not None:
                seed_t, seed_ord = shadow
                carry0 = (jnp.where(active_b, seed_t, -BIG), seed_ord)

                def fold(carry, t, ok, flags, gxp, gyp, gzp, mat, ordv,
                         uv=None):
                    best_t, best_ord = carry
                    # same strict-</ordinal comparison as the closest
                    # fold; a winner RESOLVES the lane (any-hit: no
                    # better occluder matters) — best_t -> -BIG drops
                    # it from every subsequent slab predicate.
                    upd = ok & ((t < best_t)
                                | ((t == best_t) & (ordv < best_ord)))
                    return (jnp.where(upd, -BIG, best_t),
                            jnp.where(upd, ordv, best_ord))
            else:
                best_t = jnp.where(active_b, BIG, -BIG)
                carry0 = (best_t, f0, f0, f0, f0,
                          f0, f0, f0, f0,
                          jnp.full(shape, float(1 << 24),
                                   jnp.float32))  # best_ord
                if need_mid:
                    carry0 = carry0 + (f0,)
                if need_uv:
                    carry0 = carry0 + (f0, f0)

                def fold(carry, t, ok, flags, gxp, gyp, gzp, mat, ordv,
                         uv=None):
                    (best_t, gx, gy, gz, fl,
                     m_c0, m_c1, m_c2, m_extra, best_ord) = carry[:10]
                    # strict < with lowest-original-ordinal tie-break:
                    # primitives are Morton-sorted, so visit order no
                    # longer matches the reference's first-wins list
                    # order — the carried ordinal restores it (coplanar
                    # Cornell light/walls).
                    upd = ok & ((t < best_t)
                                | ((t == best_t) & (ordv < best_ord)))
                    sel = lambda a, b: jnp.where(upd, a, b)
                    out = (sel(t, best_t), sel(gxp, gx), sel(gyp, gy),
                           sel(gzp, gz), sel(flags, fl),
                           sel(mat[1], m_c0), sel(mat[2], m_c1),
                           sel(mat[3], m_c2), sel(mat[4], m_extra),
                           sel(ordv, best_ord))
                    if need_mid:
                        out = out + (sel(mat[5], carry[10]),)
                    if need_uv:
                        u_p, v_p = uv if uv is not None else (f0, f0)
                        out = out + (sel(u_p, carry[11]),
                                     sel(v_p, carry[12]))
                    return out

            # Shadow-mode bodies skip material/normal reads entirely;
            # the fold above ignores these dummy arguments.
            _dummy_mat = (0.0,) * 6

            def make_slab(sox, soy, soz, six, siy, siz):
                """Scalar-AABB-vs-tile slab test for a given ray set: does
                ANY live lane hit the box at better-than-best t?  Returns
                the scalar predicate.  Swap-insensitive in min/max
                (inverted boxes act swapped).  Plane distances use the
                EXACT (b - o) * inv form: the hoisted b*inv - o*inv
                variant saves one op per plane but catastrophically
                cancels for near-axis-parallel lanes whose origin lies on
                a cluster plane (|o*inv| ~ 1e9+ makes the ulp exceed the
                true distance, flipping tn's sign into a false cull miss
                the exact form cannot produce — round-3 advisor finding)."""
                def slab_vals(bx0, by0, bz0, bx1, by1, bz1, best_t):
                    tx0 = (bx0 - sox) * six
                    tx1 = (bx1 - sox) * six
                    ty0 = (by0 - soy) * siy
                    ty1 = (by1 - soy) * siy
                    tz0 = (bz0 - soz) * siz
                    tz1 = (bz1 - soz) * siz
                    # Interval-overlap form of the any-lane predicate:
                    # hit ⟺ min(tf, best_t) >= max(tn, t_min), folding
                    # the t_min / better-than-best bounds into the
                    # min/max trees — 3 fewer vector ops than the
                    # 3-compare + 2-and + cvt form, and bit-identical
                    # (a - b >= 0 ⟺ a >= b in IEEE; dead lanes carry
                    # best_t = -BIG, live lanes' best_t >= t_min always,
                    # so the extra best_t >= t_min conjunct is vacuous).
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                                 jnp.minimum(ty0, ty1)),
                                     jnp.maximum(jnp.minimum(tz0, tz1),
                                                 t_min))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                                 jnp.maximum(ty0, ty1)),
                                     jnp.minimum(jnp.maximum(tz0, tz1),
                                                 best_t))
                    return jnp.max(tf - tn) >= 0.0

                def slab(ref, col, best_t):
                    return slab_vals(ref[0, col], ref[1, col], ref[2, col],
                                     ref[3, col], ref[4, col], ref[5, col],
                                     best_t)
                slab.vals = slab_vals
                return slab

            slab_any_hit = make_slab(ox, oy, oz, inv_dx, inv_dy, inv_dz)

            if frustum:
                # ---- bounce-0 frustum pretest (VERDICT r4 item 2a):
                # camera rays per Morton tile form a tight bundle; the
                # per-tile interval hull of (origin, 1/direction) gives
                # a SCALAR certain-miss test per node (~30 scalar ops on
                # the scalar core) that gates the (rows,128) vector slab
                # test behind a branch.  Conservative: a pass proves
                # nothing (vector test still runs), a fail proves ALL
                # lanes miss — identical traversal results.  Only
                # bounce 0 is coherent enough to pay; later bounces'
                # hulls are wide and the gate never fires.
                def hull(v):
                    m = jnp.where(active_b, v, jnp.inf)
                    lo = jnp.min(m)
                    m = jnp.where(active_b, v, -jnp.inf)
                    return lo, jnp.max(m)

                o_b = tuple(hull(v) for v in (ox, oy, oz))
                i_b = tuple(hull(v) for v in (inv_dx, inv_dy, inv_dz))
                inner = slab_any_hit

                def _int_test(ref, col):
                    a = jnp.float32(-3e38)
                    b = jnp.float32(3e38)
                    for k in range(3):
                        b0 = ref[k, col]
                        b1 = ref[3 + k, col]
                        (ol, oh), (il, ih) = o_b[k], i_b[k]
                        p = []
                        for bb in (b0, b1):
                            for e in (bb - ol, bb - oh):
                                p.append(e * il)
                                p.append(e * ih)
                        lo = jnp.minimum(
                            jnp.minimum(jnp.minimum(p[0], p[1]),
                                        jnp.minimum(p[2], p[3])),
                            jnp.minimum(jnp.minimum(p[4], p[5]),
                                        jnp.minimum(p[6], p[7])))
                        hi = jnp.maximum(
                            jnp.maximum(jnp.maximum(p[0], p[1]),
                                        jnp.maximum(p[2], p[3])),
                            jnp.maximum(jnp.maximum(p[4], p[5]),
                                        jnp.maximum(p[6], p[7])))
                        a = jnp.maximum(a, lo)
                        b = jnp.minimum(b, hi)
                    return jnp.maximum(a, jnp.float32(t_min)) <= b

                def slab_any_hit(ref, col, best_t):
                    return jax.lax.cond(
                        _int_test(ref, col),
                        lambda: inner(ref, col, best_t),
                        lambda: jnp.bool_(False))
                slab_any_hit.vals = inner.vals

            if ordered_any:
                # Majority direction sign per axis for THIS ray set (one
                # scalar vote per axis): picks which child the ordered
                # walk visits first.  A heuristic — minority lanes still
                # intersect correctly, just in far-first order.
                sgn_w = (jnp.sum(jnp.where(active_b, dx, 0.0)) < 0.0,
                         jnp.sum(jnp.where(active_b, dy, 0.0)) < 0.0,
                         jnp.sum(jnp.where(active_b, dz, 0.0)) < 0.0)
            else:
                sgn_w = None

            def leaf_runner(body, body2, body2_limit):
                """Run a contiguous leaf run [lo,hi) through body — or
                through body2 (the SMEM hot-prefix body) when the whole
                run lies below the prefix boundary.  Static when body2
                is absent; one scalar compare per leaf otherwise."""
                if body2 is None:
                    return lambda lo, hi, c: jax.lax.fori_loop(
                        lo, hi, body, c)

                def run(lo, hi, c):
                    return jax.lax.cond(
                        hi <= jnp.int32(body2_limit),
                        lambda cc: jax.lax.fori_loop(lo, hi, body2, cc),
                        lambda cc: jax.lax.fori_loop(lo, hi, body, cc),
                        c)
                return run

            def stack_walk(tref, body, carry, slab, sgn, start=0,
                           run_leaf=None):
                """Whole-tile ORDERED walk of the explicit-pointer BVH
                ((10, M) _cluster_stack_tree layout): a scalar stack in
                SMEM scratch, descending the NEAR child (by the tile's
                majority direction sign along the node's split axis)
                first so best_t tightens before the far subtree is
                tested — front-to-back traversal, the reference's OptiX
                traversal order (optix/renderer.cpp:703-871).  Writes
                above the stack pointer are unconditional (cheaper than
                predication) and never read back."""
                sgx, sgy, sgz = sgn
                runner = run_leaf or leaf_runner(body, None, 0)
                stack_ref[0] = jnp.int32(0) + start

                def wcond(st):
                    return st[0] > 0

                def wbody(st):
                    sp, carry = st
                    sp = sp - 1
                    node = stack_ref[sp]
                    any_hit = slab(tref, node, carry[0])
                    lft = tref[6, node].astype(jnp.int32)
                    is_leaf = lft < 0

                    def do_leaf(c):
                        lo = tref[7, node].astype(jnp.int32)
                        hi = tref[8, node].astype(jnp.int32)
                        return runner(lo, hi, c)

                    if stats_ref is not None:
                        stats_ref[0] = stats_ref[0] + 1
                        enter = (any_hit & is_leaf).astype(jnp.int32)
                        span = (tref[8, node] - tref[7, node]) \
                            .astype(jnp.int32)
                        stats_ref[1] = stats_ref[1] + enter
                        stats_ref[2] = stats_ref[2] + enter * span

                    carry = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                         lambda c: c, carry)
                    rgt = tref[7, node].astype(jnp.int32)
                    axis = tref[8, node]
                    neg = jnp.where(axis == 0.0, sgx,
                                    jnp.where(axis == 1.0, sgy, sgz))
                    near = jnp.where(neg, rgt, lft)
                    far = jnp.where(neg, lft, rgt)
                    stack_ref[sp] = far
                    stack_ref[sp + 1] = near
                    push = any_hit & jnp.logical_not(is_leaf)
                    sp = jnp.where(push, sp + 2, sp)
                    return sp, carry

                _, carry = jax.lax.while_loop(wcond, wbody,
                                              (jnp.int32(1), carry))
                return carry

            def tree_walk(tref, body, carry, slab=None, start=0,
                          run_leaf=None, run_leaf_enc=None):
                """Whole-tile lockstep walk of the threaded cluster-BVH
                ((8, M) _cluster_tree layout).  The in-kernel analogue of the
                reference's hardware BVH traversal (optixTrace bounce loop,
                device_programs.cu:211-229), vectorized TPU-style: ONE scalar
                cursor per tile; descend to the preorder child when ANY live
                lane hits the node box at better-than-best t, else follow the
                escape link; leaf hits run the primitive fold over the
                cluster's [lo,hi) run.  Per-bounce cost is O(visited nodes),
                ~O(k log N) for spatially coherent tiles, instead of the
                linear scan's O(N/CLUSTER) slab tests."""
                def wcond(st):
                    return st[0] >= 0

                slab = slab or slab_any_hit
                runner = None if run_leaf_enc is not None \
                    else (run_leaf or leaf_runner(body, None, 0))

                def wbody(st):
                    node, carry = st
                    any_hit = slab(tref, node, carry[0])
                    miss_l = tref[6, node].astype(jnp.int32)
                    lo_f = tref[7, node]
                    is_leaf = lo_f >= 0.0
                    # row 7 packs lo*64 + span (_cluster_tree layout),
                    # or the stream encoding when run_leaf_enc decodes it
                    enc = lo_f.astype(jnp.int32)

                    if run_leaf_enc is not None:
                        def do_leaf(c):
                            return run_leaf_enc(enc, c)
                    else:
                        def do_leaf(c):
                            lo = enc >> 6
                            hi = lo + (enc & 63)
                            return runner(lo, hi, c)

                    if stats_ref is not None:
                        stats_ref[0] = stats_ref[0] + 1  # nodes visited
                        enter = (any_hit & is_leaf).astype(jnp.int32)
                        stats_ref[1] = stats_ref[1] + enter  # leaves entered
                        if run_leaf_enc is None:
                            # stream chunks: the in-block mini-walk
                            # counts true per-leaf spans instead
                            stats_ref[2] = stats_ref[2] + enter * (enc & 63)

                    carry = jax.lax.cond(any_hit & is_leaf, do_leaf,
                                         lambda c: c, carry)
                    node = jnp.where(any_hit & jnp.logical_not(is_leaf),
                                     node + jnp.int32(1), miss_l)
                    return node, carry

                _, carry = jax.lax.while_loop(
                    wcond, wbody,
                    (jnp.int32(0) + start, carry))
                return carry

            def clustered(n, cl_ref, body, carry, csize=CLUSTER, start=0,
                          body2=None, body2_limit=0, run_leaf_enc=None):
                """Per-kind hierarchical cull.  Dispatches on the acceleration
                table's static shape: (8, M) = threaded cluster-BVH lockstep
                walk (leaf ranges come from the table; `start` selects the
                view — 0 = coarse, the fine tail view's root otherwise);
                (6, n_cl + 1) = linear scan over csize-sized runs with one
                scalar-predicated slab test each; tiny kinds skip culling."""
                if run_leaf_enc is not None:  # streamed big-mesh path
                    assert cl_ref is not None and cl_ref.shape[0] == 8
                    return tree_walk(cl_ref, None, carry, start=start,
                                     run_leaf_enc=run_leaf_enc)
                n_cl = max(1, -(-n // csize))
                if cl_ref is None or n <= csize:
                    # tiny kinds: the whole table fits the prefix or not —
                    # static choice, no dispatch
                    b = body2 if body2 is not None and n <= body2_limit \
                        else body
                    return jax.lax.fori_loop(0, n, b, carry)

                runner = leaf_runner(body, body2, body2_limit)
                if cl_ref.shape[0] == 10:
                    return stack_walk(cl_ref, body, carry, slab_any_hit,
                                      sgn_w, run_leaf=runner)
                if cl_ref.shape[0] == 8:
                    return tree_walk(cl_ref, body, carry, start=start,
                                     run_leaf=runner)

                def cl_body(ci, carry):
                    pred = slab_any_hit(cl_ref, ci, carry[0])

                    def do(carry):
                        lo = ci * csize
                        hi = jnp.minimum(lo + csize, n)
                        return runner(lo, hi, carry)

                    if stats_ref is not None:
                        stats_ref[0] = stats_ref[0] + 1
                        e = pred.astype(jnp.int32)
                        stats_ref[1] = stats_ref[1] + e
                        stats_ref[2] = stats_ref[2] + e * csize

                    return jax.lax.cond(pred, do, lambda c: c, carry)

                # Root pretest: the kind's union AABB rides the table as
                # the extra column at index n_cl (pack-side _append_root);
                # one slab test skips the whole per-cluster scan for
                # bounces whose live rays all miss the kind (the
                # sky-bound tail) — the root-exit tree walks get free.
                root_ok = slab_any_hit(cl_ref, n_cl, carry[0])
                if stats_ref is not None:
                    stats_ref[0] = stats_ref[0] + 1

                def scan(c):
                    return jax.lax.fori_loop(0, n_cl, cl_body, c)

                return jax.lax.cond(root_ok, scan, lambda c: c, carry)

            # --- spheres (shape.h:157-203 semantics)
            def sph_body(j, carry):
                g = sph_get(j)
                cx = g(0); cy = g(1); cz = g(2)
                r2 = g(3)
                mat = _dummy_mat if shadow is not None else mat_of(g(4))
                ordv = g(5)
                ocx = ox - cx; ocy = oy - cy; ocz = oz - cz
                b2 = dx * ocx + dy * ocy + dz * ocz
                cterm = ocx * ocx + ocy * ocy + ocz * ocz - r2
                disc = b2 * b2 - cterm
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t_near = -b2 - sq
                t_far = -b2 + sq
                fr = (t_near >= t_min).astype(jnp.float32)
                t = jnp.where(fr > 0, t_near, t_far)
                # no valid test: invalid prims pack r2 = -1 (never hits)
                ok = tcap((disc >= 0.0) & (t >= t_min), t)
                if shadow is not None:
                    return fold(carry, t, ok, 0.0, cx, cy, cz, mat, ordv)
                # Deferred normal: carry the center; normal = normalize(p - c)
                # reconstructed after the fold.
                flags = fr + (2.0 + 4.0 * mat[0])  # front | sphere | type
                return fold(carry, t, ok, flags, cx, cy, cz, mat, ordv)

            sph_cl = cluster_refs[0] if cluster_refs else None
            carry = clustered(n_sph, sph_cl, sph_body, carry0,
                              start=tree_starts[0])

            # --- quads (shape.h:213-239 baked to world space)
            def quad_body(j, carry):
                g = quad_get(j)
                qnx = g(0); qny = g(1); qnz = g(2)
                cn = g(3)
                usx = g(4); usy = g(5); usz = g(6)
                cu = g(7)
                vsx = g(8); vsy = g(9); vsz = g(10)
                cv = g(11)
                mat = _dummy_mat if shadow is not None else mat_of(g(12))
                ordv = g(13)
                dn = dx * qnx + dy * qny + dz * qnz
                on = ox * qnx + oy * qny + oz * qnz
                denom_ok = jnp.abs(dn) >= 1e-8
                inv_dn = jnp.where(denom_ok, 1.0 / jnp.where(denom_ok, dn, 1.0), 0.0)
                t = (cn - on) * inv_dn
                a = (ox * usx + oy * usy + oz * usz) \
                    + t * (dx * usx + dy * usy + dz * usz) - cu
                b = (ox * vsx + oy * vsy + oz * vsz) \
                    + t * (dx * vsx + dy * vsy + dz * vsz) - cv
                # no valid test: invalid quads pack zero normals (fails
                # denom_ok) and cu = cv = 2 (fails the extent test)
                ok = tcap(denom_ok & (t > t_min)
                          & (a * a < 1.0) & (b * b < 1.0), t)
                if shadow is not None:
                    return fold(carry, t, ok, 0.0, qnx, qny, qnz, mat,
                                ordv)
                fr = (on - cn > 0.0).astype(jnp.float32)
                # Deferred normal: raw unit plane normal; front-face sign is
                # applied after the fold.
                flags = fr + 4.0 * mat[0]
                uv = None
                if need_uv:
                    # half-extent coords: a,b = rel . us/vs, u = (a+1)/2
                    # (ops/intersect.py quad uv semantics)
                    uv = (0.5 + 0.5 * a, 0.5 + 0.5 * b)
                return fold(carry, t, ok, flags, qnx, qny, qnz, mat, ordv,
                            uv)

            quad_cl = cluster_refs[1] if cluster_refs else None
            carry = clustered(n_quad, quad_cl, quad_body, carry,
                              start=tree_starts[1])

            # --- triangles (Moller-Trumbore via triple products; smooth normal
            #     interpolated from barycentrics at test time, shape.h:262-303)
            wx = oy * dz - oz * dy
            wy = oz * dx - ox * dz
            wz = ox * dy - oy * dx

            def make_tri_body(tget):
                def tri_body(j, carry):
                    g = tget(j)
                    ngx, ngy, ngz, p0ng = g(0), g(1), g(2), g(3)
                    e1x, e1y, e1z = g(4), g(5), g(6)
                    e2x, e2y, e2z = g(7), g(8), g(9)
                    xpx, xpy, xpz = g(10), g(11), g(12)   # e2 x p0
                    pex, pey, pez = g(13), g(14), g(15)   # p0 x e1
                    # cold rows (mid, ord, vertex normals): a separate
                    # VMEM table when the hot/cold split is active, else
                    # rows 16-26 of the same ref
                    nc = tri_cold_get(j) if tri_cold_get is not None \
                        else (lambda k: g(16 + k))
                    ordv = nc(1)
                    if shadow is None:
                        mat = mat_of(nc(0))
                        n0x, n0y, n0z = nc(2), nc(3), nc(4)
                        n1x, n1y, n1z = nc(5), nc(6), nc(7)
                        n2x, n2y, n2z = nc(8), nc(9), nc(10)
                    div = -(dx * ngx + dy * ngy + dz * ngz)
                    div_ok = div != 0.0
                    inv = jnp.where(div_ok,
                                    1.0 / jnp.where(div_ok, div, 1.0), 0.0)
                    t = (ox * ngx + oy * ngy + oz * ngz - p0ng) * inv
                    b1 = ((wx * e2x + wy * e2y + wz * e2z)
                          - (dx * xpx + dy * xpy + dz * xpz)) * inv
                    b2_ = (-(wx * e1x + wy * e1y + wz * e1z)
                           - (dx * pex + dy * pey + dz * pez)) * inv
                    # no valid test: invalid tris pack a zero geometric
                    # normal, so div == 0 fails div_ok
                    ok = tcap(div_ok & (t >= t_min)
                              & (b1 >= 0.0) & (b2_ >= 0.0)
                              & (b1 + b2_ <= 1.0), t)
                    if shadow is not None:
                        return fold(carry, t, ok, 0.0, ngx, ngy, ngz,
                                    _dummy_mat, ordv)
                    b0 = 1.0 - b1 - b2_
                    inx = b0 * n0x + b1 * n1x + b2_ * n2x
                    iny = b0 * n0y + b1 * n1y + b2_ * n2y
                    inz = b0 * n0z + b1 * n1z + b2_ * n2z
                    back = (dx * inx + dy * iny + dz * inz) > 0.0
                    fr = jnp.where(back, 0.0, 1.0)
                    # Deferred normal: raw interpolated normal
                    # (unnormalized, unflipped — backface flip rides the
                    # front flag, shape.h:294-302).
                    flags = fr + 4.0 * mat[0]
                    uv = None
                    if need_uv:
                        # barycentric texcoord blend (rows 27-32 on
                        # image-textured scenes; intersect.py t_uv)
                        u0, v0_ = nc(11), nc(12)
                        u1, v1_ = nc(13), nc(14)
                        u2, v2_ = nc(15), nc(16)
                        uv = (b0 * u0 + b1 * u1 + b2_ * u2,
                              b0 * v0_ + b1 * v1_ + b2_ * v2_)
                    return fold(carry, t, ok, flags, inx, iny, inz, mat,
                                ordv, uv)
                return tri_body

            tri_cl = cluster_refs[2] if cluster_refs else None
            if tri_stream:
                # Streamed big-mesh path (r5 redesign): triangles ride
                # HBM as per-chunk BLOCKS of (tri_stream +
                # STREAM_NODE_ROWS) rows — triangle rows first, then the
                # chunk's OWN threaded mini-tree (_assemble_stream_
                # blocks).  The SMEM top tree walks to a chunk; the
                # kernel then (a) serves it from a two-slot VMEM
                # residency cache when the block is already loaded,
                # else (b) STARTS its DMA, folds the PREVIOUS pending
                # chunk while the copy flies (1-deep pipeline: the DMA
                # overlaps a whole mini-walk + the top-tree walk to the
                # next leaf), and defers this chunk as pending.  The
                # mini-walk tests ~STREAM_SUB triangles per entered
                # sub-leaf instead of the full 128-triangle chunk (the
                # round-4 path's dominant cost).  Deferral only lags
                # best_t available to slab pretests (conservative —
                # extra entries, never missed hits); the strict-<
                # /ordinal winner fold keeps images bit-identical to
                # the dense path.  Lifts the 2^18 packed-leaf cap and
                # the VMEM wall (reference: optixAccelBuild's own
                # memory manager, optix/renderer.cpp:703-765).
                scr_ref, sem_ref, st_ref = tri_stream_refs
                from jax.experimental.pallas import tpu as _pltpu
                shift = int(math.ceil(math.log2(tri_stream + 1)))
                tri_rows = tri_stream // tri_pack
                snode = tri_snode or STREAM_NODE_ROWS or tri_stream // 4
                block = tri_rows + snode
                stride = LANES // tri_pack
                shift_p = tri_pack.bit_length() - 1  # pack is 1/2/4

                def sget_packed(base, slot):
                    """Reader for triangle SLOT `slot` of a packed row:
                    row j of the resident block, attrs at the slot's
                    STATIC lane offset (no dynamic lane indexing)."""
                    off = slot * stride

                    def get(j):
                        r = base + j
                        return lambda k: scr_ref[r, off + k]
                    return get

                def chunk_walk(base, c):
                    """Threaded walk of a resident block's mini-tree
                    (node rows at [base+tri_rows, ...), packed triangle
                    rows at [base, ...); same preorder/escape encoding
                    as the SMEM trees, lo*64+span SLOT-range leaf
                    encs — group-aligned so each tested row folds its
                    tri_pack slots at static offsets)."""
                    tbs = [make_tri_body(sget_packed(base, p))
                           for p in range(tri_pack)]
                    node0 = base + jnp.int32(tri_rows)

                    def wcond(s):
                        return s[0] >= 0

                    def wbody(s):
                        nd, c = s
                        r = node0 + nd
                        miss = scr_ref[r, 6].astype(jnp.int32)
                        enc = scr_ref[r, 7].astype(jnp.int32)
                        is_leaf = enc >= 0
                        hit = slab_any_hit.vals(
                            scr_ref[r, 0], scr_ref[r, 1], scr_ref[r, 2],
                            scr_ref[r, 3], scr_ref[r, 4], scr_ref[r, 5],
                            c[0])
                        if stats_ref is not None:
                            stats_ref[0] = stats_ref[0] + 1
                            e = (hit & is_leaf).astype(jnp.int32)
                            stats_ref[1] = stats_ref[1] + e
                            stats_ref[2] = stats_ref[2] + e * (enc & 63)

                        def do_leaf(c):
                            row_lo = (enc >> 6) >> shift_p
                            groups = (enc & 63) >> shift_p

                            def grp(gi, c):
                                for tb in tbs:
                                    c = tb(row_lo + gi, c)
                                return c

                            return jax.lax.fori_loop(0, groups, grp, c)

                        c = jax.lax.cond(hit & is_leaf, do_leaf,
                                         lambda c: c, c)
                        nd = jnp.where(hit & jnp.logical_not(is_leaf),
                                       nd + jnp.int32(1), miss)
                        return nd, c

                    _, c = jax.lax.while_loop(wcond, wbody,
                                              (jnp.int32(0), c))
                    return c

                def dma_for(chunk, base):
                    lo = chunk * jnp.int32(block)
                    return _pltpu.make_async_copy(
                        tri_hbm_ref.at[pl.ds(lo, block)],
                        scr_ref.at[pl.ds(base, block)], sem_ref)

                def fold_pending(c):
                    pend = st_ref[0]
                    pbase = st_ref[1] * jnp.int32(block)
                    dma_for(pend >> shift, pbase).wait()
                    return chunk_walk(pbase, c)

                def stream_leaf(enc, c):
                    chunk = enc >> shift
                    pend = st_ref[0]
                    pbuf = st_ref[1]
                    have_pend = pend >= 0
                    res0 = st_ref[2] == chunk
                    res1 = st_ref[3] == chunk
                    resident = res0 | res1
                    res_buf = jnp.where(res0, jnp.int32(0), jnp.int32(1))
                    # conflict: the resident slot is the one an
                    # in-flight pending DMA targets — wait it first
                    conflict = have_pend & resident & (res_buf == pbuf)
                    fold_first = have_pend & (
                        conflict | jnp.logical_not(resident))
                    c = jax.lax.cond(fold_first, fold_pending,
                                     lambda c: c, c)
                    nbuf = jnp.where(have_pend, 1 - pbuf, 1 - st_ref[4])

                    def start(_):
                        dma_for(chunk, nbuf * jnp.int32(block)).start()
                        return 0

                    jax.lax.cond(jnp.logical_not(resident), start,
                                 lambda _: 0, 0)
                    c = jax.lax.cond(
                        resident,
                        lambda c: chunk_walk(
                            res_buf * jnp.int32(block), c),
                        lambda c: c, c)
                    not_res = jnp.logical_not(resident)
                    st_ref[0] = jnp.where(
                        resident,
                        jnp.where(fold_first, jnp.int32(-1), pend), enc)
                    st_ref[1] = jnp.where(resident, pbuf, nbuf)
                    st_ref[2] = jnp.where(not_res & (nbuf == 0), chunk,
                                          st_ref[2])
                    st_ref[3] = jnp.where(not_res & (nbuf == 1), chunk,
                                          st_ref[3])
                    st_ref[4] = jnp.where(not_res, nbuf, st_ref[4])
                    return c

                carry = clustered(n_tri, tri_cl, None, carry, tri_stream,
                                  run_leaf_enc=stream_leaf)
                # Flush: the last chunk's fold must land before this
                # bounce's closest hit is consumed.  The residency
                # cache (st_ref[2:5]) survives into later bounces.
                carry = jax.lax.cond(st_ref[0] >= 0, fold_pending,
                                     lambda c: c, carry)
                st_ref[0] = jnp.int32(-1)
            else:
                tri_body = make_tri_body(tri_get)
                # Partial SMEM hot prefix: a second body reading hot
                # scalars from SMEM, dispatched per LEAF (leaves are
                # contiguous SAH runs, so hi <= prefix-width decides the
                # whole run).
                tri_body_sm = make_tri_body(tri_hot_get) \
                    if tri_hot_get is not None else None

                carry = clustered(n_tri, tri_cl, tri_body, carry,
                                  TRI_CLUSTER, start=tree_starts[2],
                                  body2=tri_body_sm,
                                  body2_limit=tri_hot_n)

            if inst_refs is not None and n_inst > 0:
                # ---- instanced meshes (in-kernel TLAS/BLAS, the role of
                # the reference's IAS-over-GAS, optix/renderer.cpp:833-870):
                # a linear scan over instance world AABBs (instances are
                # few); on entry the TILE's rays transform into mesh-local
                # space by the inverse affine WITHOUT renormalizing (local
                # t == world t) and walk that mesh's cluster-BVH over
                # LOCAL triangles.  Geometry memory ∝ unique meshes.
                itri_ref, iacc_ref, ibox_ref, inst_ref = inst_refs
                itri_get = make_reader(itri_ref, itri_vmem)

                def inst_body(ii, carry):
                    pred = slab_any_hit(ibox_ref, ii, carry[0])

                    def enter(carry):
                        gi = lambda k: inst_ref[k, ii]
                        root = gi(0).astype(jnp.int32)
                        i00, i01, i02, i03 = gi(1), gi(2), gi(3), gi(4)
                        i10, i11, i12, i13 = gi(5), gi(6), gi(7), gi(8)
                        i20, i21, i22, i23 = gi(9), gi(10), gi(11), gi(12)
                        m00, m01, m02 = gi(13), gi(14), gi(15)
                        m10, m11, m12 = gi(16), gi(17), gi(18)
                        m20, m21, m22 = gi(19), gi(20), gi(21)
                        mat = _dummy_mat if shadow is not None \
                            else mat_of(gi(22))
                        ord_base = gi(23)

                        lox = i00 * ox + i01 * oy + i02 * oz + i03
                        loy = i10 * ox + i11 * oy + i12 * oz + i13
                        loz = i20 * ox + i21 * oy + i22 * oz + i23
                        ldx = i00 * dx + i01 * dy + i02 * dz
                        ldy = i10 * dx + i11 * dy + i12 * dz
                        ldz = i20 * dx + i21 * dy + i22 * dz
                        eps_ = 1e-20
                        lix = 1.0 / jnp.where(jnp.abs(ldx) < eps_,
                                              jnp.where(ldx < 0, -eps_,
                                                        eps_), ldx)
                        liy = 1.0 / jnp.where(jnp.abs(ldy) < eps_,
                                              jnp.where(ldy < 0, -eps_,
                                                        eps_), ldy)
                        liz = 1.0 / jnp.where(jnp.abs(ldz) < eps_,
                                              jnp.where(ldz < 0, -eps_,
                                                        eps_), ldz)
                        l_slab = make_slab(lox, loy, loz, lix, liy, liz)
                        lwx = loy * ldz - loz * ldy
                        lwy = loz * ldx - lox * ldz
                        lwz = lox * ldy - loy * ldx

                        def itri_body(j, carry):
                            g = itri_get(j)
                            ngx, ngy, ngz, p0ng = g(0), g(1), g(2), g(3)
                            e1x, e1y, e1z = g(4), g(5), g(6)
                            e2x, e2y, e2z = g(7), g(8), g(9)
                            xpx, xpy, xpz = g(10), g(11), g(12)
                            pex, pey, pez = g(13), g(14), g(15)
                            if shadow is None:
                                nc = itri_cold_get(j) if itri_cold_get \
                                    is not None else (lambda k: g(16 + k))
                                n0x, n0y, n0z = nc(0), nc(1), nc(2)
                                n1x, n1y, n1z = nc(3), nc(4), nc(5)
                                n2x, n2y, n2z = nc(6), nc(7), nc(8)
                            div = -(ldx * ngx + ldy * ngy + ldz * ngz)
                            div_ok = div != 0.0
                            inv = jnp.where(
                                div_ok,
                                1.0 / jnp.where(div_ok, div, 1.0), 0.0)
                            t = (lox * ngx + loy * ngy + loz * ngz
                                 - p0ng) * inv
                            b1 = ((lwx * e2x + lwy * e2y + lwz * e2z)
                                  - (ldx * xpx + ldy * xpy
                                     + ldz * xpz)) * inv
                            b2_ = (-(lwx * e1x + lwy * e1y + lwz * e1z)
                                   - (ldx * pex + ldy * pey
                                      + ldz * pez)) * inv
                            ok = tcap(div_ok & (t >= t_min)
                                      & (b1 >= 0.0) & (b2_ >= 0.0)
                                      & (b1 + b2_ <= 1.0), t)
                            if shadow is not None:
                                ordv = ord_base + j.astype(jnp.float32)
                                return fold(carry, t, ok, 0.0, ngx, ngy,
                                            ngz, mat, ordv)
                            b0 = 1.0 - b1 - b2_
                            inx = b0 * n0x + b1 * n1x + b2_ * n2x
                            iny = b0 * n0y + b1 * n1y + b2_ * n2y
                            inz = b0 * n0z + b1 * n1z + b2_ * n2z
                            # local normal -> world (inverse-transpose)
                            # at fold time so the carried plane is world.
                            wnx = m00 * inx + m01 * iny + m02 * inz
                            wny = m10 * inx + m11 * iny + m12 * inz
                            wnz = m20 * inx + m21 * iny + m22 * inz
                            back = (dx * wnx + dy * wny + dz * wnz) > 0.0
                            fr = jnp.where(back, 0.0, 1.0)
                            # unique deterministic ordinal: per-instance
                            # base + local-table index (both exact in f32)
                            ordv = ord_base + j.astype(jnp.float32)
                            flags = fr + 4.0 * mat[0]
                            uv = None
                            if need_uv:
                                # barycentric texcoord blend (itri rows
                                # 25-30, pack_instance_tables with_uv)
                                u0, v0_ = nc(9), nc(10)
                                u1, v1_ = nc(11), nc(12)
                                u2, v2_ = nc(13), nc(14)
                                uv = (b0 * u0 + b1 * u1 + b2_ * u2,
                                      b0 * v0_ + b1 * v1_ + b2_ * v2_)
                            return fold(carry, t, ok, flags, wnx, wny, wnz,
                                        mat, ordv, uv)

                        if iacc_ref.shape[0] == 10:
                            # near-first needs LOCAL-space direction votes
                            lsgn = (
                                jnp.sum(jnp.where(active_b, ldx, 0.0)) < 0.0,
                                jnp.sum(jnp.where(active_b, ldy, 0.0)) < 0.0,
                                jnp.sum(jnp.where(active_b, ldz, 0.0)) < 0.0)
                            return stack_walk(iacc_ref, itri_body, carry,
                                              l_slab, lsgn, start=root)
                        return tree_walk(iacc_ref, itri_body, carry,
                                         slab=l_slab, start=root)

                    return jax.lax.cond(pred, enter, lambda c: c, carry)

                carry = jax.lax.fori_loop(0, n_inst, inst_body, carry)

            return carry

        carry = closest_hit(ox, oy, oz, dx, dy, dz, alive_b,
                            frustum=frustum0)

        (best_t, gx, gy, gz, flags,
         m_c0, m_c1, m_c2, m_extra, _) = carry[:10]

        hit = best_t < BIG

        # Decode the packed flags plane ONCE per bounce: bit 0 front-face,
        # bit 1 kind-is-sphere, bits 2+ material type.
        flagsi = flags.astype(jnp.int32)
        front = (flagsi & 1).astype(jnp.float32)
        is_sph_k = (flagsi & 2) > 0
        m_type = flagsi >> 2

        # Winner hit point + deferred shading-normal reconstruction (once
        # per bounce instead of per tested primitive): spheres carried
        # their center (normal = normalize(p - c)); quads carried the unit
        # plane normal; triangles the raw interpolated normal.  All three
        # flip by the carried front flag (sphere shape.h:190-196, quad
        # shape.h:232, triangle shape.h:294-302).
        px = ox + best_t * dx
        py = oy + best_t * dy
        pz = oz + best_t * dz
        nrx = jnp.where(is_sph_k, px - gx, gx)
        nry = jnp.where(is_sph_k, py - gy, gy)
        nrz = jnp.where(is_sph_k, pz - gz, gz)
        n_ilen = jax.lax.rsqrt(jnp.maximum(
            nrx * nrx + nry * nry + nrz * nrz, 1e-30))
        sgn_n = (front * 2.0 - 1.0) * n_ilen
        nx = nrx * sgn_n
        ny = nry * sgn_n
        nz = nrz * sgn_n

        if itex:
            # In-kernel IMAGE textures (bounded: quad/tri materials,
            # textures <= PRT_KERNEL_TEX_MAX^2 texels — engines/tables
            # validates).  Each texture is u8-quantized and packed
            # r*65536+g*256+b into f32 rows of 128 texels (exact ints
            # < 2^24); the per-lane texel fetch is a STATIC row loop +
            # take_along_axis lane gather (the one per-lane dynamic
            # indexing Mosaic supports), so cost scales with texture
            # rows, not size of the scene.  Bilinear with repeat wrap —
            # the ops/textures.sample_atlas semantics (sample MULTIPLIES
            # the base albedo).  Substituted before every consumer,
            # like the checker.
            m_id = carry[10]
            u_c = carry[11]
            v_c = carry[12]
            if n_sph > 0:
                # Deferred sphere equirect UV (intersect.py:316-321
                # semantics), reconstructed post-fold from the carried
                # center exactly like the normal: outward = p - c
                # (IGNORING the front flag — inside hits keep the
                # outward map, matching the jnp engines).  atan2/asin
                # via the VPU polynomial forms.
                s_u = 0.5 + vpu_atan2(nrz, nrx) \
                    * jnp.float32(1.0 / (2.0 * np.pi))
                s_v = 0.5 - vpu_asin(jnp.clip(nry * n_ilen, -1.0, 1.0)) \
                    * jnp.float32(1.0 / np.pi)
                u_c = jnp.where(is_sph_k, s_u, u_c)
                v_c = jnp.where(is_sph_k, s_v, v_c)
            u_w = u_c - jnp.floor(u_c)
            v_w = v_c - jnp.floor(v_c)
            for (cm, toff, th, tw) in itex:
                thf, twf = float(th), float(tw)
                x = u_w * twf - 0.5
                y = (1.0 - v_w) * thf - 0.5
                x0 = jnp.floor(x)
                y0 = jnp.floor(y)
                fx = x - x0
                fy = y - y0
                n_rows = -(-(th * tw) // LANES)

                def wrap(val, ext):
                    return val - ext * jnp.floor(val * (1.0 / ext))

                def fetch(yi, xi):
                    idx = (wrap(yi, thf) * twf
                           + wrap(xi, twf)).astype(jnp.int32)
                    row = idx >> 7
                    lane = idx & 127
                    val = f0
                    for r_i in range(n_rows):
                        rv = jnp.broadcast_to(
                            itex_ref[pl.ds(toff + r_i, 1), :], shape)
                        cand = jnp.take_along_axis(rv, lane, axis=1)
                        val = jnp.where(row == r_i, cand, val)
                    # decode packed u24 -> r,g,b in [0,1]
                    r8 = jnp.floor(val * (1.0 / 65536.0))
                    rem = val - r8 * 65536.0
                    g8 = jnp.floor(rem * (1.0 / 256.0))
                    b8 = rem - g8 * 256.0
                    s = 1.0 / 255.0
                    return r8 * s, g8 * s, b8 * s

                c00 = fetch(y0, x0)
                c01 = fetch(y0, x0 + 1.0)
                c10 = fetch(y0 + 1.0, x0)
                c11 = fetch(y0 + 1.0, x0 + 1.0)
                smp = tuple(
                    (c00[k] * (1.0 - fx) + c01[k] * fx) * (1.0 - fy)
                    + (c10[k] * (1.0 - fx) + c11[k] * fx) * fy
                    for k in range(3))
                selt = m_id == cm
                m_c0 = jnp.where(selt, smp[0] * m_c0, m_c0)
                m_c1 = jnp.where(selt, smp[1] * m_c1, m_c1)
                m_c2 = jnp.where(selt, smp[2] * m_c2, m_c2)

        if checker:
            # Procedural 3D checker albedo (Scene.add_checker): the
            # world-cell parity of the hit point picks the odd color.
            # Unrolled over the STATIC checker-material list; substituted
            # here — before the emission / NEE / attenuation consumers —
            # so every albedo use sees the textured value.  Checker mats
            # are Lambertian, so emissive m_c0 reads are never masked in.
            m_id = carry[10]
            coff = 0.3183098861  # lattice offset — ops/textures.py
            for cm, cs, c2r, c2g, c2b in checker:
                cell = (jnp.floor(px * cs + coff)
                        + jnp.floor(py * cs + coff)
                        + jnp.floor(pz * cs + coff))
                odd = cell - 2.0 * jnp.floor(cell * 0.5)  # mod 2, exact
                selc = (m_id == cm) & (odd > 0.5)
                m_c0 = jnp.where(selc, c2r, m_c0)
                m_c1 = jnp.where(selc, c2g, m_c1)
                m_c2 = jnp.where(selc, c2b, m_c2)

        # miss: sky * throughput, kill (cuda_megakernel/renderer.cu:98-101)
        miss = alive_b & ~hit
        mw = miss.astype(jnp.float32)
        if len(sky) == 3:  # the reference's constant sky
            sk0, sk1, sk2 = sky[0], sky[1], sky[2]
        else:
            # Directional sky spec (13-tuple from engines.tables._sky_spec):
            # gradient lerp on the normalized y + static-power sun disc —
            # same math as ops/sky.sky_radiance, so jnp engines agree.
            (b0, b1, b2, tp0, tp1, tp2,
             sd0, sd1, sd2, sc0, sc1, sc2, spow) = sky
            inv_l = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
            tmix = 0.5 * (dy * inv_l + 1.0)
            sk0 = b0 + tmix * (tp0 - b0)
            sk1 = b1 + tmix * (tp1 - b1)
            sk2 = b2 + tmix * (tp2 - b2)
            if sc0 or sc1 or sc2:
                cosang = jnp.maximum(
                    (dx * sd0 + dy * sd1 + dz * sd2) * inv_l, 0.0)
                w, p, base = f0 + 1.0, int(spow), cosang
                while p:  # static binary exponentiation
                    if p & 1:
                        w = w * base
                    base, p = base * base, p >> 1
                sk0 = sk0 + w * sc0
                sk1 = sk1 + w * sc1
                sk2 = sk2 + w * sc2
        rr = rr + mw * tr * sk0
        rg = rg + mw * tg * sk1
        rb = rb + mw * tb * sk2

        # emission before the scatter test (material.h:119-132); the
        # compressed record stores emission in c0..c2 for emissive
        # materials (their albedo slot — attenuation is never applied to a
        # terminated path).  Under NEE, suppressed when the previous
        # bounce was diffuse (that vertex's light sample owns this term).
        lit = alive_b & hit
        lw = lit.astype(jnp.float32) * (m_type == MAT_EMISSIVE) * emit_w
        rr = rr + lw * tr * m_c0
        rg = rg + lw * tg * m_c1
        rb = rb + lw * tb * m_c2

        if nee and n_lights > 0:
            # ---------------- next-event estimation (ops/nee.py semantics,
            # in-kernel): pick one light per lane, sample a direction,
            # shadow-trace through the SAME closest-hit machinery, and add
            # the analytic direct term for Lambertian vertices.
            is_lam_n = m_type == MAT_LAMBERTIAN
            u_l = _uniform01(rng_d, 5)
            u_a = _uniform01(rng_d, 6)
            u_b = _uniform01(rng_d, 7)
            li = jnp.minimum((u_l * n_lights).astype(jnp.int32),
                             n_lights - 1)

            def sel_light(l, acc):
                m = (li == l).astype(jnp.float32)
                return tuple(p * (1.0 - m) + lights_ref[k, l] * m
                             for k, p in enumerate(acc))

            n_lrows = 28 if NEE_ANYHIT else 18
            params = jax.lax.fori_loop(0, n_lights, sel_light,
                                       (f0,) * n_lrows)
            (lkind, lord, lcx, lcy, lcz, lr,
             lux, luy, luz, lvx, lvy, lvz,
             lqx, lqy, lqz, ler, leg, leb) = params[:18]
            if NEE_ANYHIT:
                (lcn, lusx, lusy, lusz, lcu,
                 lvsx, lvsy, lvsz, lcv, lr2) = params[18:]

            # sphere light: uniform cone toward the sphere
            tox = lcx - px; toy = lcy - py; toz = lcz - pz
            dc2 = tox * tox + toy * toy + toz * toz
            inv_dc = jax.lax.rsqrt(jnp.maximum(dc2, 1e-20))
            axx = tox * inv_dc; axy = toy * inv_dc; axz = toz * inv_dc
            sin2m = jnp.clip(lr * lr / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
            cosm = jnp.sqrt(jnp.maximum(1.0 - sin2m, 0.0))
            cost = 1.0 - u_a * (1.0 - cosm)
            sint = jnp.sqrt(jnp.maximum(1.0 - cost * cost, 0.0))
            phi_l = TWO_PI * u_b
            hsel = (jnp.abs(axx) > 0.9).astype(jnp.float32)
            hx = 1.0 - hsel; hy = hsel
            t1x = axy * 0.0 - axz * hy
            t1y = axz * hx - axx * 0.0
            t1z = axx * hy - axy * hx
            t_il = jax.lax.rsqrt(jnp.maximum(
                t1x * t1x + t1y * t1y + t1z * t1z, 1e-20))
            t1x = t1x * t_il; t1y = t1y * t_il; t1z = t1z * t_il
            t2x = axy * t1z - axz * t1y
            t2y = axz * t1x - axx * t1z
            t2z = axx * t1y - axy * t1x
            cp = jnp.cos(phi_l) * sint
            sp = jnp.sin(phi_l) * sint
            wsx = axx * cost + t1x * cp + t2x * sp
            wsy = axy * cost + t1y * cp + t2y * sp
            wsz = axz * cost + t1z * cp + t2z * sp
            pdf_s = 1.0 / jnp.maximum(TWO_PI * (1.0 - cosm), 1e-12)
            s_ok = dc2 > lr * lr

            # quad light: uniform area -> solid-angle pdf
            a2 = 2.0 * u_a - 1.0
            b2l = 2.0 * u_b - 1.0
            qpx = lcx + a2 * lux + b2l * lvx - px
            qpy = lcy + a2 * luy + b2l * lvy - py
            qpz = lcz + a2 * luz + b2l * lvz - pz
            dist2 = qpx * qpx + qpy * qpy + qpz * qpz
            inv_dq = jax.lax.rsqrt(jnp.maximum(dist2, 1e-20))
            wqx = qpx * inv_dq; wqy = qpy * inv_dq; wqz = qpz * inv_dq
            crx = luy * lvz - luz * lvy
            cry = luz * lvx - lux * lvz
            crz = lux * lvy - luy * lvx
            area = 4.0 * jnp.sqrt(jnp.maximum(
                crx * crx + cry * cry + crz * crz, 0.0))
            cosl = jnp.abs(wqx * lqx + wqy * lqy + wqz * lqz)
            pdf_q = dist2 / jnp.maximum(cosl * area, 1e-12)
            q_ok = cosl > 1e-6

            is_sphl = lkind == float(KIND_SPHERE)
            wix = jnp.where(is_sphl, wsx, wqx)
            wiy = jnp.where(is_sphl, wsy, wqy)
            wiz = jnp.where(is_sphl, wsz, wqz)
            pdf_l = jnp.where(is_sphl, pdf_s, pdf_q) / float(n_lights)
            ok_f = jnp.where(is_sphl, s_ok.astype(jnp.float32),
                             q_ok.astype(jnp.float32))
            cos_s = wix * nx + wiy * ny + wiz * nz
            cand = (lit & is_lam_n & (cos_s > 0.0)
                    & (ok_f > 0.5))

            if NEE_ANYHIT:
                # ---- ANY-HIT shadow walk (VERDICT r4 item 2b): instead
                # of a full closest-hit fold (carry 10 planes, walk the
                # whole scene), seed the fold with the light's OWN hit
                # (t_light, light ordinal) and carry only (t, ord): any
                # occluder that beats the seed — t < t_light, or equal-t
                # with a smaller ordinal (the coplanar Cornell ceiling
                # semantics) — RESOLVES the lane (its best_t drops to
                # -BIG, excluding it from every later slab test), and
                # nodes beyond the light are culled from the start.
                # t_light replicates the packed primitive tests bit-
                # exactly (pack_lights_table rows 18-27), so visibility
                # is BIT-IDENTICAL to the closest-hit formulation
                # (PRT_NEE_ANYHIT=0 restores it; tests assert equality).
                # The reference gets this from optixTrace's
                # TERMINATE_ON_FIRST_HIT shadow-ray idiom; this is the
                # lockstep-tile equivalent.
                sh_ocx = px - lcx; sh_ocy = py - lcy; sh_ocz = pz - lcz
                sh_b2 = wix * sh_ocx + wiy * sh_ocy + wiz * sh_ocz
                sh_ct = (sh_ocx * sh_ocx + sh_ocy * sh_ocy
                         + sh_ocz * sh_ocz - lr2)
                sh_disc = sh_b2 * sh_b2 - sh_ct
                sh_sq = jnp.sqrt(jnp.maximum(sh_disc, 0.0))
                sh_tn = -sh_b2 - sh_sq
                sh_fr = (sh_tn >= t_min).astype(jnp.float32)
                sh_ts = jnp.where(sh_fr > 0, sh_tn, -sh_b2 + sh_sq)
                sh_ok_s = tcap((sh_disc >= 0.0) & (sh_ts >= t_min),
                               sh_ts)

                sh_dn = wix * lqx + wiy * lqy + wiz * lqz
                sh_on = px * lqx + py * lqy + pz * lqz
                sh_dok = jnp.abs(sh_dn) >= 1e-8
                sh_inv = jnp.where(
                    sh_dok, 1.0 / jnp.where(sh_dok, sh_dn, 1.0), 0.0)
                sh_tq = (lcn - sh_on) * sh_inv
                sh_a = ((px * lusx + py * lusy + pz * lusz)
                        + sh_tq * (wix * lusx + wiy * lusy + wiz * lusz)
                        - lcu)
                sh_bq = ((px * lvsx + py * lvsy + pz * lvsz)
                         + sh_tq * (wix * lvsx + wiy * lvsy + wiz * lvsz)
                         - lcv)
                sh_ok_q = tcap(sh_dok & (sh_tq > t_min)
                               & (sh_a * sh_a < 1.0)
                               & (sh_bq * sh_bq < 1.0), sh_tq)

                sh_t = jnp.where(is_sphl, sh_ts, sh_tq)
                sh_hit = jnp.where(is_sphl,
                                   sh_ok_s.astype(jnp.float32),
                                   sh_ok_q.astype(jnp.float32)) > 0.5
                cand = cand & sh_hit
                sh = closest_hit(px, py, pz, wix, wiy, wiz, cand,
                                 shadow=(sh_t, lord))
                vis = sh[1] == lord
            else:
                sh = closest_hit(px, py, pz, wix, wiy, wiz, cand)
                vis = (sh[0] < BIG) & (sh[9] == lord)

            w_l = (cos_s / (float(np.pi)
                            * jnp.maximum(pdf_l, 1e-12))) \
                * (cand & vis).astype(jnp.float32)
            rr = rr + tr * m_c0 * w_l * ler
            rg = rg + tg * m_c1 * w_l * leg
            rb = rb + tb * m_c2 * w_l * leb

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
        rxm = dx - 2.0 * dn_ * nx + m_extra * ux
        rym = dy - 2.0 * dn_ * ny + m_extra * uy
        rzm = dz - 2.0 * dn_ * nz + m_extra * uz

        ri = jnp.where(front > 0, 1.0 / m_extra, m_extra)
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

        att_r = jnp.where(is_die, 1.0, m_c0)
        att_g = jnp.where(is_die, 1.0, m_c1)
        att_b = jnp.where(is_die, 1.0, m_c2)

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

        if nee and n_lights > 0:
            # Mark diffuse continuations: emission is suppressed at the
            # NEXT vertex (alive == 2 encoding, see emit_w above).
            cw = cw * jnp.where(is_lam, 2.0, 1.0)

        return (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, cw)

    return bounce_step


# ---------------------------------------------------------------------------
# Kernel 1: full megakernel (all bounces in one invocation).
# ---------------------------------------------------------------------------

def _make_trace_kernel(rows, max_depth, t_min, t_max, n_sph, n_quad, n_tri,
                       sky, rr_depth=0, vmem_kinds=(False, False, False),
                       nee=False, n_lights=0, n_inst=0, itri_vmem=False,
                       sub_rows=0, collect_stats=False,
                       tri_split=False, itri_split=False,
                       tail_roots=None, tail_depth=TAIL_DEPTH,
                       tri_part=False, checker: tuple = (),
                       depth_out=False, tri_stream=0, tri_pack=1,
                       tri_snode=0, itex: tuple = ()):
    import jax.experimental.pallas as pl

    # In-kernel sub-tiling: split each (rows, 128) tile into independent
    # (sub, 128) blocks, each with its OWN bounce loop, tree walks, cluster
    # entry predicates and early-exit.  Divergent secondary rays then drag
    # only their block into a cluster, not the whole tile — the lockstep
    # worst case the mesh measurements identified (RESULTS.md) — without
    # paying the grid-level per-tile DMA/pipeline overhead smaller
    # BlockSpec tiles cost.  sub_rows=0 disables (one block per tile).
    sub = sub_rows if 0 < sub_rows < rows else rows
    n_sub = rows // sub
    assert rows % sub == 0, (rows, sub)

    def kernel(seed_ref, pix_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
               dz_ref, sph_ref, quad_ref, tri_ref, sph_cl, quad_cl, tri_cl,
               mats_ref, lights_ref, *rest):
        rest = list(rest)
        itex_ref = rest.pop(0) if itex else None
        tri_stream_refs = None
        if tri_stream:  # scratch order: ..., scr, DMA sem, SMEM state
            t_st = rest.pop()
            t_sem = rest.pop()
            t_scr = rest.pop()
            tri_stream_refs = (t_scr, t_sem, t_st)
            # stream state: [pending enc, pending slot, loaded chunk 0,
            # loaded chunk 1, last slot] — per-tile init
            t_st[0] = jnp.int32(-1)
            t_st[1] = jnp.int32(0)
            t_st[2] = jnp.int32(-1)
            t_st[3] = jnp.int32(-1)
            t_st[4] = jnp.int32(0)
        if collect_stats:
            stats_scr = rest.pop()
            stack_ref = rest.pop()
            stats_out = rest.pop()
            for k in range(4):
                stats_scr[k] = jnp.int32(0)
        else:
            stack_ref = rest.pop()
            stats_out = stats_scr = None
        dd_ref = rest.pop() if depth_out else None
        tri_cold_get = None
        if tri_split:
            tri_cold_get = make_reader(rest.pop(0), True)
        tri_get = make_reader(tri_ref, vmem_kinds[2])
        tri_hot_get, tri_hot_n = None, 0
        if tri_part:
            href = rest.pop(0)
            tri_hot_get = make_reader(href, False)
            tri_hot_n = int(href.shape[1])
        itri_cold_get = None
        if n_inst > 0:
            itri_ref, iacc_ref, ibox_ref, inst_ref = rest[:4]
            rest = rest[4:]
            if itri_split:
                itri_cold_get = make_reader(rest.pop(0), True)
            inst_refs = (itri_ref, iacc_ref, ibox_ref, inst_ref)
            rr_ref, rg_ref, rb_ref = rest
        else:
            rr_ref, rg_ref, rb_ref = rest
            inst_refs = None
        shape = (sub, LANES)

        def mk_step(starts, frustum0=False):
            return _make_bounce_step(
                shape, t_min, t_max, sky, n_sph, n_quad, n_tri,
                make_reader(sph_ref, vmem_kinds[0]),
                make_reader(quad_ref, vmem_kinds[1]),
                tri_get,
                rr_depth, (sph_cl, quad_cl, tri_cl), mats_ref,
                lights_ref, nee, n_lights, inst_refs, n_inst, itri_vmem,
                stack_ref, stats_scr, tri_cold_get, itri_cold_get,
                tree_starts=starts, tri_hot_get=tri_hot_get,
                tri_hot_n=tri_hot_n, checker=checker,
                tri_stream=tri_stream, tri_stream_refs=tri_stream_refs,
                tri_hbm_ref=tri_ref, tri_pack=tri_pack,
                tri_snode=tri_snode, itex=itex,
                itex_ref=itex_ref, frustum0=frustum0)

        step = mk_step((0, 0, 0))
        # bounce-0 specialization (frustum pretest): identical results,
        # scalar certain-miss gate on the coherent camera bundle
        step0 = mk_step((0, 0, 0), frustum0=FRUSTUM0) if FRUSTUM0 \
            else step
        # Straggler-tail phase: bounces >= tail_depth walk the FINE view
        # of the shared SAH tree (roots from _sah_threaded_tree) — when a
        # tile is held alive by a few straggler lanes, thin leaves test
        # far fewer primitives per entry.  Results are bit-identical
        # (same primitives, strict-</ordinal fold) — only cost moves.
        tail = (tail_roots is not None and any(r > 0 for r in tail_roots)
                and 0 < tail_depth < max_depth)
        if tail:
            step_tail = mk_step(tuple(max(r, 0) for r in tail_roots))

        f0 = jnp.zeros(shape, jnp.float32)
        f1 = jnp.ones(shape, jnp.float32)

        def block(si, _):
            sl = pl.ds(si * sub, sub)
            # Pixel-keyed RNG (not tile-position-keyed): the image is
            # invariant to ray ORDER, so Morton-permuted raygen, sharded
            # pixel blocks and the queue-compacting engines all produce
            # bit-identical streams for the same pixel (the OptiX
            # per-pixel PCG pattern, device_programs.cu:169).
            rng_base = _pcg_hash(
                pix_ref[sl, :].astype(jnp.int32).astype(jnp.uint32)
                ^ seed_ref[0].astype(jnp.uint32))
            state = (ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :],
                     dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :],
                     f1, f1, f1, f0, f0, f0, f1)

            def make_bounce(stp):
                def bounce(depth, state):
                    # Early exit: a fully-terminated block skips the
                    # primitive loops (the queue-emptiness check the
                    # reference disabled to avoid host sync,
                    # renderer.cu:422-425 — free here).
                    any_alive = jnp.sum(state[12]) > 0.0
                    if collect_stats:
                        stats_scr[3] = stats_scr[3] \
                            + any_alive.astype(jnp.int32)

                    def live(st):
                        rng_d = rng_base \
                            + jnp.uint32(depth) * jnp.uint32(0x85EBCA6B)
                        return stp(rng_d, st, depth)

                    return jax.lax.cond(any_alive, live, lambda st: st,
                                        state)
                return bounce

            if depth_out:
                # Per-ray termination depth (bounces the lane entered
                # alive) — the depth-sort probe output (engines/fused.py
                # PRT_DEPTH_SORT).  One add per bounce per lane.
                def with_depth(b):
                    def bounce2(depth, carry):
                        st, dd = carry
                        dd = dd + (st[12] > 0.0).astype(jnp.float32)
                        return (b(depth, st), dd)
                    return bounce2
                # init from a real vector (not a replicated splat):
                # Mosaic rejects the replicated->concrete relayout a
                # plain zeros init needs in the loop carry on TPU.
                carry = (state, state[0] * 0.0)
                carry = with_depth(make_bounce(step0))(0, carry)
                if tail:
                    carry = jax.lax.fori_loop(
                        1, tail_depth, with_depth(make_bounce(step)), carry)
                    carry = jax.lax.fori_loop(
                        tail_depth, max_depth,
                        with_depth(make_bounce(step_tail)), carry)
                else:
                    carry = jax.lax.fori_loop(
                        1, max_depth, with_depth(make_bounce(step)), carry)
                state, ddv = carry
                dd_ref[sl, :] = ddv
            elif tail:
                state = make_bounce(step0)(0, state)
                state = jax.lax.fori_loop(1, tail_depth,
                                          make_bounce(step), state)
                state = jax.lax.fori_loop(tail_depth, max_depth,
                                          make_bounce(step_tail), state)
            else:
                state = make_bounce(step0)(0, state)
                state = jax.lax.fori_loop(1, max_depth, make_bounce(step),
                                          state)
            rr_ref[sl, :] = state[9]
            rg_ref[sl, :] = state[10]
            rb_ref[sl, :] = state[11]
            return _

        if n_sub == 1:
            block(0, None)
        else:
            jax.lax.fori_loop(0, n_sub, block, None)
        if collect_stats:
            # per-tile [nodes/clusters tested, leaves entered, prims
            # tested, alive bounces] in row 0, lanes 0-3 of an (8, 128)
            # VMEM block (SMEM outputs can't satisfy the TPU block-shape
            # rules at multi-tile grids).
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            vals = jnp.zeros((8, LANES), jnp.int32)
            for k in range(4):
                vals = jnp.where((row == 0) & (lane == k),
                                 stats_scr[k], vals)
            stats_out[:, :] = vals

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rows", "max_depth", "t_min", "t_max", "sky",
                     "interpret", "rr_depth", "vmem_kinds", "nee",
                     "itri_vmem", "sub_rows", "collect_stats",
                     "tail_roots", "tail_depth", "checker", "depth_out",
                     "tri_stream", "tri_pack", "tri_snode", "itex"))
def pallas_trace(o: jax.Array, d: jax.Array, pix: jax.Array,
                 sph_tab: jax.Array,
                 quad_tab: jax.Array, tri_tab: jax.Array,
                 sph_cl: jax.Array, quad_cl: jax.Array, tri_cl: jax.Array,
                 mats: jax.Array, lights: jax.Array, seed: jax.Array,
                 rows: int, max_depth: int, t_min: float, t_max: float,
                 sky: Tuple[float, float, float],
                 interpret: bool = False, rr_depth: int = 0,
                 vmem_kinds: Tuple[bool, bool, bool] = (False, False, False),
                 nee: bool = False, inst=None, itri_vmem: bool = False,
                 sub_rows: int = 0, collect_stats: bool = False,
                 tri_cold=None, itri_cold=None,
                 tail_roots=None, tail_depth: int = TAIL_DEPTH,
                 tri_hot=None, checker: tuple = (),
                 depth_out: bool = False, tri_stream: int = 0,
                 tri_pack: int = 1, tri_snode: int = 0,
                 itex: tuple = (), itex_tab=None,
                 ) -> jax.Array:
    """Trace R rays (R divisible by rows*128). pix: (R,) f32 pixel ids
    keying the per-ray RNG stream. Returns (R,3) radiance; with
    collect_stats also an (n_tiles, 8) i32 per-tile counter table
    [nodes/clusters slab-tested, leaves entered, prims tested, alive
    bounces, 0...] for the traversal diagnostics harness."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = o.shape[0]
    tile = rows * LANES
    assert r % tile == 0, (r, tile)
    assert r <= (1 << 24), (
        f"pallas_trace pixel ids exceed f32 integer range: {r} > 2^24")
    n_tiles = r // tile

    planes = [pix, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    planes = [p.reshape(n_tiles * rows, LANES) for p in planes]

    def tab_n(tab, vm):
        return int(tab.shape[0]) if vm else int(tab.shape[1])

    # Callers pass nee=True only when the scene HAS samplable lights
    # (lights is a traced array here — no value checks under jit).
    n_lights = int(lights.shape[1]) if nee else 0
    n_inst = int(inst[3].shape[1]) if inst is not None else 0
    kernel = _make_trace_kernel(rows, max_depth, t_min, t_max,
                                tab_n(sph_tab, vmem_kinds[0]),
                                tab_n(quad_tab, vmem_kinds[1]),
                                tab_n(tri_tab, vmem_kinds[2]),
                                sky, rr_depth, vmem_kinds, nee, n_lights,
                                n_inst, itri_vmem, sub_rows, collect_stats,
                                tri_cold is not None,
                                itri_cold is not None,
                                tail_roots, tail_depth,
                                tri_part=tri_hot is not None,
                                checker=checker, depth_out=depth_out,
                                tri_stream=tri_stream, tri_pack=tri_pack,
                                tri_snode=tri_snode, itex=itex)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # Scene tables live in SMEM: the kernel reads them as SCALARS with
    # dynamic per-primitive indices, which VMEM vector loads cannot do
    # (Mosaic requires lane indices provably 128-aligned).
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    tab_specs = [vmem_full if vm else smem for vm in vmem_kinds]
    if tri_stream:
        # streamed big-mesh triangles: the (rows, 128) table stays in
        # HBM; leaves DMA into the VMEM scratch below on entry
        tab_specs[2] = pl.BlockSpec(memory_space=pltpu.ANY)
    interp = pltpu.InterpretParams() if interpret else False
    cold_arrays = []
    cold_specs = []
    if tri_cold is not None:
        cold_arrays.append(tri_cold)
        cold_specs.append(vmem_full)
    if tri_hot is not None:
        # partial SMEM hot prefix for oversize (vmem-rows) tables
        cold_arrays.append(tri_hot)
        cold_specs.append(smem)
    inst_arrays = []
    inst_specs = []
    if inst is not None:
        inst_specs = [vmem_full if itri_vmem else smem, smem, smem, smem]
        inst_arrays = list(inst)
        if itri_cold is not None:
            inst_arrays.append(itri_cold)
            inst_specs.append(vmem_full)
    itex_arrays = []
    itex_specs = []
    if itex:
        itex_arrays = [itex_tab]
        itex_specs = [vmem_full]
    n_out = 4 if depth_out else 3
    out_specs = [ray_spec] * n_out
    out_shape = [jax.ShapeDtypeStruct((n_tiles * rows, LANES), jnp.float32)
                 ] * n_out
    scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32)]
    if collect_stats:
        out_specs.append(pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_tiles * 8, LANES),
                                              jnp.int32))
        scratch.append(pltpu.SMEM((8,), jnp.int32))
    if tri_stream:
        # two block slots (residency cache + DMA double-buffer), one
        # DMA semaphore (<=1 copy in flight by construction), and the
        # 5-scalar stream state
        # SMEM scratch: block reads are SCALAR loads overlapped on the
        # scalar core (the dense path's economics) instead of VMEM lane
        # extracts on the VPU — the measured stream-path read cost
        _snode = tri_snode or STREAM_NODE_ROWS or tri_stream // 4
        scratch.append(pltpu.SMEM(
            (2 * (tri_stream // tri_pack + _snode), LANES),
            jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        scratch.append(pltpu.SMEM((5,), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem, *[ray_spec] * 7, *tab_specs,
                  smem, smem, smem, smem, smem, *itex_specs,
                  *cold_specs, *inst_specs],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interp,
    )(seed, *planes, sph_tab, quad_tab, tri_tab, sph_cl, quad_cl, tri_cl,
      mats, lights, *itex_arrays, *cold_arrays, *inst_arrays)

    rr, rg, rb = out[:3]
    rad = jnp.stack([rr.reshape(r), rg.reshape(r), rb.reshape(r)], axis=1)
    if collect_stats:
        stats = out[n_out].reshape(n_tiles, 8, LANES)[:, 0, :8]
        if depth_out:
            return rad, out[3].reshape(r), stats
        return rad, stats
    if depth_out:
        return rad, out[3].reshape(r)
    return rad


# ---------------------------------------------------------------------------
# Kernel 2: a SEGMENT of n_bounces over a compacted queue (the
# wavefront_fused engine's stage; n_bounces=1 is the hybrid single-bounce).
# ---------------------------------------------------------------------------

def _make_segment_kernel(rows, n_bounces, t_min, t_max, n_sph, n_quad,
                         n_tri, sky, rr_depth=0,
                         vmem_kinds=(False, False, False),
                         nee=False, n_lights=0, n_inst=0, itri_vmem=False,
                         tri_split=False, itri_split=False,
                         checker: tuple = (), tri_stream=0, tri_pack=1,
                         tri_snode=0, itex: tuple = (), frustum0=False):
    import jax.experimental.pallas as pl

    def kernel(scalar_ref,  # SMEM (3,): [seed, depth0, count]
               pix_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tr_ref, tg_ref, tb_ref, rr_ref, rg_ref, rb_ref, al_ref,
               sph_ref, quad_ref, tri_ref, sph_cl, quad_cl, tri_cl,
               mats_ref, lights_ref, *rest):
        rest = list(rest)
        itex_ref = rest.pop(0) if itex else None
        tri_stream_refs = None
        if tri_stream:
            t_st = rest.pop()
            t_sem = rest.pop()
            t_scr = rest.pop()
            tri_stream_refs = (t_scr, t_sem, t_st)
            t_st[0] = jnp.int32(-1)
            t_st[1] = jnp.int32(0)
            t_st[2] = jnp.int32(-1)
            t_st[3] = jnp.int32(-1)
            t_st[4] = jnp.int32(0)
        stack_ref = rest.pop()
        tri_cold_get = None
        if tri_split:
            tri_cold_get = make_reader(rest.pop(0), True)
        itri_cold_get = None
        if n_inst > 0:
            itri_ref, iacc_ref, ibox_ref, inst_ref = rest[:4]
            rest = rest[4:]
            if itri_split:
                itri_cold_get = make_reader(rest.pop(0), True)
            inst_refs = (itri_ref, iacc_ref, ibox_ref, inst_ref)
        else:
            inst_refs = None
        (oxo, oyo, ozo, dxo, dyo, dzo, tro, tgo, tbo,
         rro, rgo, rbo, alive_o) = rest
        tile = pl.program_id(0)
        shape = (rows, LANES)
        seed = scalar_ref[0]
        depth0 = scalar_ref[1]
        count = scalar_ref[2]

        in_queue_start = tile * jnp.int32(rows * LANES)
        row_id = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane_id = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        slot = in_queue_start + row_id * jnp.int32(LANES) + lane_id
        # Queue prefix is alive (compacted); the INCOMING alive plane
        # carries the NEE no-emit encoding (1 = emit allowed, 2 =
        # previous bounce was diffuse) across segment boundaries.
        in_q = jnp.where(slot < count, al_ref[:], 0.0)

        # Pixel-keyed RNG: compaction/sort order cannot change the image.
        rng_base = _pcg_hash(
            pix_ref[:].astype(jnp.int32).astype(jnp.uint32)  # f32 pix ids
            ^ seed.astype(jnp.uint32))

        def mk_step(f0_):
            return _make_bounce_step(
                shape, t_min, t_max, sky, n_sph, n_quad, n_tri,
                make_reader(sph_ref, vmem_kinds[0]),
                make_reader(quad_ref, vmem_kinds[1]),
                make_reader(tri_ref, vmem_kinds[2]),
                rr_depth, (sph_cl, quad_cl, tri_cl), mats_ref,
                lights_ref, nee, n_lights, inst_refs, n_inst, itri_vmem,
                stack_ref, None, tri_cold_get, itri_cold_get,
                checker=checker, tri_stream=tri_stream,
                tri_stream_refs=tri_stream_refs, tri_hbm_ref=tri_ref,
                tri_pack=tri_pack, tri_snode=tri_snode, itex=itex,
                itex_ref=itex_ref, frustum0=f0_)

        step = mk_step(False)

        state = (ox_ref[:], oy_ref[:], oz_ref[:],
                 dx_ref[:], dy_ref[:], dz_ref[:],
                 tr_ref[:], tg_ref[:], tb_ref[:],
                 rr_ref[:], rg_ref[:], rb_ref[:], in_q)

        def bounce(i, st, stp=None):
            any_alive = jnp.sum(st[12]) > 0.0
            stp = stp or step

            def live(st):
                depth = depth0 + i
                rng_d = rng_base \
                    + depth.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
                return stp(rng_d, st, depth)

            return jax.lax.cond(any_alive, live, lambda st: st, st)

        if frustum0:
            # this segment starts at absolute depth 0: its first bounce
            # traces the coherent camera bundle — frustum-gated step
            state = bounce(0, state, mk_step(True))
            state = jax.lax.fori_loop(
                1, n_bounces, lambda i, st: bounce(i, st), state)
        else:
            state = jax.lax.fori_loop(
                0, n_bounces, lambda i, st: bounce(i, st), state)

        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = state
        oxo[:] = ox; oyo[:] = oy; ozo[:] = oz
        dxo[:] = dx; dyo[:] = dy; dzo[:] = dz
        tro[:] = tr; tgo[:] = tg; tbo[:] = tb
        rro[:] = rr; rgo[:] = rg; rbo[:] = rb
        alive_o[:] = alive

    return kernel


def pallas_segment(pix, o9, sph_tab, quad_tab, tri_tab,
                   sph_cl, quad_cl, tri_cl, mats, lights, scalars,
                   rows: int, n_bounces: int, t_min: float, t_max: float,
                   sky: Tuple[float, float, float],
                   interpret: bool = False, rr_depth: int = 0,
                   vmem_kinds: Tuple[bool, bool, bool] = (False, False, False),
                   nee: bool = False, inst=None, itri_vmem: bool = False,
                   tri_cold=None, itri_cold=None, checker: tuple = (),
                   tri_stream: int = 0, tri_pack: int = 1,
                   tri_snode: int = 0, itex: tuple = (), itex_tab=None,
                   frustum0: bool = False):
    """n_bounces of the path loop over the (queue-ordered) ray planes.

    pix: (R,) f32 pixel ids; o9: tuple of 13 (R,) f32 planes
    (ox,oy,oz,dx,dy,dz,tr,tg,tb,rr,rg,rb,alive) — radiance rides the
    state and is accumulated IN kernel (one end-of-frame scatter instead
    of one per segment); the alive plane carries the NEE no-emit flag
    (alive==2) across segments; scalars: (3,) i32 [seed, depth0, count].
    Returns (new 12 planes, alive (R,) f32).
    RNG is keyed on (pixel id, absolute depth), so any permutation of the
    queue between segments leaves the image bit-identical."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = pix.shape[0]
    tile = rows * LANES
    assert r % tile == 0
    # Pixel ids ride f32 planes; beyond 2^24 they lose integer exactness
    # and the pixel-keyed RNG streams would collide/correlate.
    assert r <= (1 << 24), (
        f"pallas_segment pixel ids exceed f32 integer range: {r} > 2^24")
    n_tiles = r // tile

    planes = [pix, *o9]
    planes = [p.reshape(n_tiles * rows, LANES) for p in planes]

    def tab_n(tab, vm):
        return int(tab.shape[0]) if vm else int(tab.shape[1])

    n_lights = int(lights.shape[1]) if nee else 0
    n_inst = int(inst[3].shape[1]) if inst is not None else 0
    kernel = _make_segment_kernel(rows, n_bounces, t_min, t_max,
                                  tab_n(sph_tab, vmem_kinds[0]),
                                  tab_n(quad_tab, vmem_kinds[1]),
                                  tab_n(tri_tab, vmem_kinds[2]),
                                  sky, rr_depth, vmem_kinds, nee, n_lights,
                                  n_inst, itri_vmem,
                                  tri_cold is not None,
                                  itri_cold is not None,
                                  checker=checker, tri_stream=tri_stream,
                                  tri_pack=tri_pack, tri_snode=tri_snode,
                                  itex=itex, frustum0=frustum0)

    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    interp = pltpu.InterpretParams() if interpret else False

    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    tab_specs = [vmem_full if vm else smem for vm in vmem_kinds]
    if tri_stream:  # streamed big-mesh triangles stay in HBM
        tab_specs[2] = pl.BlockSpec(memory_space=pltpu.ANY)
    itex_arrays = []
    itex_specs = []
    if itex:
        itex_arrays = [itex_tab]
        itex_specs = [vmem_full]
    cold_arrays = []
    cold_specs = []
    if tri_cold is not None:
        cold_arrays.append(tri_cold)
        cold_specs.append(vmem_full)
    inst_arrays = []
    inst_specs = []
    if inst is not None:
        inst_specs = [vmem_full if itri_vmem else smem, smem, smem, smem]
        inst_arrays = list(inst)
        if itri_cold is not None:
            inst_arrays.append(itri_cold)
            inst_specs.append(vmem_full)
    scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32)]
    if tri_stream:
        # SMEM scratch: block reads are SCALAR loads overlapped on the
        # scalar core (the dense path's economics) instead of VMEM lane
        # extracts on the VPU — the measured stream-path read cost
        _snode = tri_snode or STREAM_NODE_ROWS or tri_stream // 4
        scratch.append(pltpu.SMEM(
            (2 * (tri_stream // tri_pack + _snode), LANES),
            jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        scratch.append(pltpu.SMEM((5,), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[smem, *[ray_spec] * 14, *tab_specs,
                  smem, smem, smem, smem, smem, *itex_specs,
                  *cold_specs, *inst_specs],
        out_specs=[ray_spec] * 13,
        out_shape=[jax.ShapeDtypeStruct((n_tiles * rows, LANES), jnp.float32)
                   ] * 13,
        scratch_shapes=scratch,
        interpret=interp,
    )(scalars, *planes, sph_tab, quad_tab, tri_tab, sph_cl, quad_cl, tri_cl,
      mats, lights, *itex_arrays, *cold_arrays, *inst_arrays)

    flat = [p.reshape(r) for p in out]
    return flat[:12], flat[12]




def to_vmem_rows(tab: np.ndarray) -> np.ndarray:
    """(C, Np) SMEM-layout table -> (Np, 128) VMEM row layout (dynamic
    sublane reads + static lane extracts inside the kernel)."""
    c, n = tab.shape
    assert c <= LANES
    out = np.zeros((n, LANES), np.float32)
    out[:, :c] = tab.T
    return out


#: Mosaic SMEM capacity per core (measured: "Used 1.28M of 1.00M smem")
#: minus headroom for the scalar stack, loop state and compiler slack.
SMEM_BYTES = 1_048_576
SMEM_HEADROOM = 96 * 1024


def smem_padded_bytes(shape) -> int:
    """Actual SMEM footprint of a (R, C) f32 window: rows pad to a
    multiple of 8, columns to a multiple of 128 (measured from compiler
    OOM reports: f32[18,10000] allocates 970,752 B = 24x10112x4;
    f32[9,4999] allocates 327,680 B = 16x5120x4)."""
    r, c = shape
    return ((r + 7) // 8 * 8) * ((c + 127) // 128 * 128) * 4


def plan_table(tab: np.ndarray, hot_rows: int, other_smem_bytes: int,
               vmem_threshold: int, allow_partial: bool = True):
    """Placement plan for a primitive table whose first `hot_rows` rows
    are read per TEST and whose remainder is read only at fold time.

    allow_partial=False disables the large-case hot/cold VMEM split +
    SMEM prefix (below) and keeps the single merged VMEM-rows table:
    the wavefront segment kernel carries 14 full ray planes and the
    two-table split pushes its scoped-VMEM stack over the 16 MiB
    compiler limit (measured OOM at 19.84M on the dragon), while the
    prefix dispatch only exists in the fused bounce kernel anyway.

    Returns (main, cold, vmem_flag, split_flag, hot_part):
    - small tables: whole table in SMEM (cold = hot_part = None);
    - mid-size: HOT rows as an SMEM table + cold rows as VMEM rows — per
      tested primitive the kernel does hot_rows scalar loads (overlapped
      on the scalar core) instead of a dynamic row load + C lane
      extracts, which measured as the dominant mesh leaf cost
      (benchmarks/RESULTS.md);
    - large (dragon-scale, the round-2 hot/cold cliff): hot rows as
      VMEM rows + cold rows as VMEM rows (the mid-size split with the
      hot side spilled) PLUS hot_part — the hot rows of the largest
      SMEM-fitting column PREFIX.  The kernel dispatches PER LEAF (SAH
      leaves are contiguous primitive runs): leaves entirely below the
      prefix boundary read their hot scalars from SMEM exactly like the
      mid-size case; only boundary/suffix leaves pay the VMEM hot row
      load.  The SAH permutation makes the prefix an
      arbitrary-but-large fraction of all tests."""
    n = tab.shape[1]
    if n <= vmem_threshold:
        return np.ascontiguousarray(tab), None, False, False, None
    hot_bytes = smem_padded_bytes((hot_rows, n))
    if hot_bytes + other_smem_bytes + SMEM_HEADROOM <= SMEM_BYTES:
        hot = np.ascontiguousarray(tab[:hot_rows])
        cold = to_vmem_rows(tab[hot_rows:])
        return hot, cold, False, True, None
    avail = SMEM_BYTES - SMEM_HEADROOM - other_smem_bytes
    pad_rows = (hot_rows + 7) // 8 * 8
    n_smem = max(0, avail // (pad_rows * 4)) // 128 * 128
    if allow_partial and n_smem >= 1024:
        # below 1024 columns the leaf dispatch isn't worth it
        hot_part = np.ascontiguousarray(tab[:hot_rows, :n_smem])
        return (to_vmem_rows(tab[:hot_rows]),
                to_vmem_rows(tab[hot_rows:]), True, True, hot_part)
    return to_vmem_rows(tab), None, True, False, None
