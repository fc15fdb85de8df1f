"""Per-frame BVH refit for animated scenes.

The reference builds its acceleration structure once at Init and never
refits ("Built once at Init; no refit/rebuild on change",
optix/renderer.cpp:703-871, SURVEY.md §2.3) — moving geometry would
require a full rebuild.  Here, refit is a device-side level sweep:

- The threaded preorder layout encodes children implicitly: an internal
  node s has left child s+1 and right child node_miss[s+1] (the left
  subtree's escape link lands exactly on its sibling).
- A host-side plan groups internal nodes by tree depth once at build;
  each frame, leaf AABBs are recomputed from the (possibly updated)
  primitive arrays and unions sweep bottom-up level by level — O(depth)
  gather/scatter passes, all inside jit.

Topology is reused as long as primitive IDENTITY is fixed (same count,
same kinds); only positions/sizes may change.  Quality degrades if
primitives migrate far (standard LBVH-refit caveat) — rebuild when the
scene changes structurally.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.accel.lbvh import BVHData
from parallelraytracing_tpu.core.scene import (
    KIND_QUAD, KIND_SPHERE, KIND_TRIANGLE, SceneData)


@dataclasses.dataclass(frozen=True)
class RefitPlan:
    """Per-level internal-node index triples (node, left, right), deepest
    level first, plus the quad padding used at build."""

    levels: Tuple[Tuple[np.ndarray, np.ndarray, np.ndarray], ...]
    quad_pad: float = 1e-2


def build_refit_plan(bvh: BVHData) -> RefitPlan:
    kind = np.asarray(bvh.node_kind)
    miss = np.asarray(bvh.node_miss)
    m = len(kind)
    if m == 1:
        return RefitPlan(levels=())

    # Depth of every node by a preorder walk (children of s start at s+1).
    depth = np.zeros(m, np.int32)
    stack = [(0, 0)]
    # Reconstruct traversal: node s internal -> children are s+1 and
    # miss[s+1]'s slot... simpler: walk preorder with an explicit stack of
    # escape targets.
    depth[0] = 0
    for s in range(m):
        if kind[s] < 0:  # internal
            left = s + 1
            right = miss[s + 1]
            depth[left] = depth[s] + 1
            depth[right] = depth[s] + 1

    internals = np.nonzero(kind < 0)[0]
    lefts = internals + 1
    rights = miss[internals + 1]
    levels: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for d in range(int(depth[internals].max()) if len(internals) else 0, -1, -1):
        sel = depth[internals] == d
        if sel.any():
            levels.append((internals[sel].astype(np.int32),
                           lefts[sel].astype(np.int32),
                           rights[sel].astype(np.int32)))
    return RefitPlan(levels=tuple(levels))


def leaf_aabbs(scene: SceneData, kind: jax.Array, idx: jax.Array,
               quad_pad: float = 1e-2):
    """(M,3)x2 AABBs for leaf nodes from current primitive arrays (internal
    nodes get placeholder boxes, overwritten by the sweep)."""
    si = jnp.clip(idx, 0, scene.sph_center.shape[0] - 1)
    sc = scene.sph_center[si]
    sr = scene.sph_radius[si][:, None]
    s_min, s_max = sc - sr, sc + sr

    qi = jnp.clip(idx, 0, scene.quad_center.shape[0] - 1)
    qc = scene.quad_center[qi]
    ext = (jnp.abs(scene.quad_u[qi]) + jnp.abs(scene.quad_v[qi]) + quad_pad)
    q_min, q_max = qc - ext, qc + ext

    ti = jnp.clip(idx, 0, scene.tri_v0.shape[0] - 1)
    v0 = scene.tri_v0[ti]
    v1 = scene.tri_v1[ti]
    v2 = scene.tri_v2[ti]
    t_min = jnp.minimum(jnp.minimum(v0, v1), v2)
    t_max = jnp.maximum(jnp.maximum(v0, v1), v2)

    k = kind[:, None]
    mn = jnp.where(k == KIND_SPHERE, s_min,
                   jnp.where(k == KIND_QUAD, q_min, t_min))
    mx = jnp.where(k == KIND_SPHERE, s_max,
                   jnp.where(k == KIND_QUAD, q_max, t_max))
    return mn, mx


def refit_bvh(bvh: BVHData, scene: SceneData, plan: RefitPlan) -> BVHData:
    """Recompute all node AABBs from current primitive positions (jit-safe;
    call inside the frame step for animated scenes)."""
    mn, mx = leaf_aabbs(scene, bvh.node_kind, bvh.node_idx, plan.quad_pad)
    is_leaf = (bvh.node_kind >= 0)[:, None]
    node_min = jnp.where(is_leaf, mn, bvh.node_min)
    node_max = jnp.where(is_leaf, mx, bvh.node_max)

    for nodes, lefts, rights in plan.levels:
        n = jnp.asarray(nodes)
        l = jnp.asarray(lefts)
        r = jnp.asarray(rights)
        node_min = node_min.at[n].set(
            jnp.minimum(node_min[l], node_min[r]))
        node_max = node_max.at[n].set(
            jnp.maximum(node_max[l], node_max[r]))

    return dataclasses.replace(bvh, node_min=node_min, node_max=node_max)
