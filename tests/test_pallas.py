"""Fused Pallas megakernel: statistical agreement with the jnp oracle.

The kernel uses a different (on-core) RNG stream, so agreement is
distributional: mean radiance per image region must converge to the
oracle's, and deterministic pixels (sky, direct emissive hits without
jitter) must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu import (Film, RenderConfig, Scene, ScenePreset,
                                    create_renderer)
from parallelraytracing_tpu.core.camera import default_camera
from parallelraytracing_tpu.ops.pallas_trace import pack_scene_tables

pytestmark = pytest.mark.slow  # Pallas interpret kernels


def render(engine, preset, cfg, frames):
    scene = Scene(preset)
    film = Film(cfg.width, cfg.height)
    r = create_renderer(engine)
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    for _ in range(frames):
        r.progressive_render()
    return np.asarray(film.hdr_average())


def small_cfg(**kw):
    base = dict(width=64, height=32, max_depth=6, seed=3,
                intersect_chunk=32, ray_tile=1 << 16)
    base.update(kw)
    return RenderConfig(**base)


def test_scene_tables_shapes():
    import numpy as np

    scene = Scene(ScenePreset.RANDOM_BALLS_SMALL).build()
    (sph, quad, tri, sph_cl, quad_cl, tri_cl, mats, _troots,
     _eye_used, _stream, _pack, _sn) = pack_scene_tables(scene, accel="linear")
    assert sph.shape[0] == 6 and sph.shape[1] == scene.sph_radius.shape[0]
    assert quad.shape[0] == 14
    assert tri.shape[0] == 27
    assert mats.shape[0] == 5
    # invalid primitives are encoded as never-hit geometry (r2 = -1 for
    # spheres, zero normal for quads) instead of a valid flag
    assert (sph[3] > 0).sum() == 108  # 100 balls + 8 emissive
    assert ((np.abs(quad[:3]).sum(0) > 0)).sum() == 1
    # ordinal row is a permutation (morton sort)
    assert sorted(sph[5].astype(int)) == list(range(sph.shape[1]))
    # material ids address the material table
    valid_s = sph[3] > 0
    assert (sph[4][valid_s] >= 0).all() \
        and (sph[4][valid_s] < mats.shape[1]).all()
    # cluster AABBs contain their primitives (+1 = the root pretest col)
    from parallelraytracing_tpu.ops.pallas_trace import CLUSTER
    assert sph_cl.shape[0] == 6
    n_cl = -(-sph.shape[1] // CLUSTER)
    assert sph_cl.shape[1] == n_cl + 1
    # the root column is the union of the cluster columns
    assert np.allclose(sph_cl[:3, n_cl],
                       sph_cl[:3, :n_cl].min(1), atol=1e-5)
    assert np.allclose(sph_cl[3:, n_cl],
                       sph_cl[3:, :n_cl].max(1), atol=1e-5)
    for c in range(n_cl):
        lo, hi = c * CLUSTER, min((c + 1) * CLUSTER, sph.shape[1])
        valid = sph[3, lo:hi] > 0
        if valid.any():
            centers = sph[:3, lo:hi][:, valid]
            radii = np.sqrt(sph[3, lo:hi][valid])
            assert (centers - radii >= sph_cl[:3, c:c+1] - 1e-4).all()
            assert (centers + radii <= sph_cl[3:, c:c+1] + 1e-4).all()


@pytest.mark.parametrize("preset", [ScenePreset.MATERIAL_TEST,
                                    ScenePreset.CORNELL,
                                    ScenePreset.DEFAULT])
def test_fused_statistically_matches_oracle(preset):
    cfg = small_cfg()
    a = render("megakernel", preset, cfg, frames=24)
    b = render("fused", preset, cfg, frames=24)
    # Different RNG streams: agreement is statistical. Means converge
    # (verified to 0.1% at 192 spp); per-pixel MC noise at 24 spp leaves
    # a tail of slow pixels (dielectric caustics), hence the loose gate.
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.05
    close = np.abs(a - b) < 0.25 * (a + b) + 0.05
    assert close.mean() > 0.85


def test_fused_sky_exact_without_jitter():
    cfg = small_cfg(jitter=False)
    scene = Scene(preset=None)
    scene.add_lambertian((1, 1, 1))
    for engine in ("megakernel", "fused"):
        film = Film(cfg.width, cfg.height)
        r = create_renderer(engine)
        r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
        r.progressive_render()
        img = np.asarray(film.hdr_average())
        np.testing.assert_allclose(
            img, np.broadcast_to([0.4, 0.3, 0.6], img.shape), atol=1e-5)


def test_fused_finite_on_mesh_scene():
    from parallelraytracing_tpu.core.mesh import load_ply
    mesh = load_ply("/root/reference/assets/models/icosahedron.ply")
    s = Scene(preset=None)
    m = s.add_metal((0.9, 0.9, 0.9), 0.1)
    s.add_mesh(mesh, m, ((1, 1, 1), (0, 0, 0), (0, 1, 0)))
    g = s.add_lambertian((0.5, 0.5, 0.5))
    s.add_quad(20, 20, g, None)
    cfg = small_cfg()
    film = Film(cfg.width, cfg.height)
    r = create_renderer("fused")
    r.init(film, s, default_camera(cfg.width, cfg.height), cfg)
    r.progressive_render()
    img = np.asarray(film.hdr_average())
    assert np.isfinite(img).all() and (img >= 0).all()


def test_cluster_tree_structure():
    """Threaded cluster-BVH well-formedness: leaves partition the
    primitive range exactly once, escape links are valid preorder
    forward-jumps, and internal boxes contain their leaves."""
    import numpy as np

    from parallelraytracing_tpu.ops.pallas_trace import (
        _cluster_bounds, _cluster_tree)

    rng = np.random.default_rng(5)
    n = 1000
    mn = rng.uniform(-50, 50, (n, 3))
    mx = mn + rng.uniform(0.1, 4.0, (n, 3))
    csize = 8
    cl = _cluster_bounds(mn, mx, csize)
    tree = _cluster_tree(cl, n, csize)
    assert tree.shape[0] == 8  # row count is an SMEM padding boundary
    m = tree.shape[1]
    enc = tree[7]
    miss = tree[6]
    leaves = enc >= 0
    # row 7 packs lo*64 + span; every primitive covered exactly once
    lo = (enc.astype(np.int64) >> 6)
    hi = lo + (enc.astype(np.int64) & 63)
    cover = np.zeros(n, np.int32)
    for s in np.nonzero(leaves)[0]:
        cover[int(lo[s]):int(hi[s])] += 1
    assert (cover == 1).all()
    # escape links jump strictly forward (or terminate)
    idx = np.arange(m)
    assert ((miss > idx) | (miss == -1)).all()
    # internal nodes contain every leaf in their preorder span
    for s in np.nonzero(~leaves)[0]:
        end = int(miss[s]) if miss[s] >= 0 else m
        span = np.arange(s + 1, end)
        span_leaves = span[leaves[span]]
        assert len(span_leaves) > 0
        assert (tree[:3, span_leaves] >= tree[:3, s:s+1] - 1e-5).all()
        assert (tree[3:6, span_leaves] <= tree[3:6, s:s+1] + 1e-5).all()


def test_cluster_stack_tree_structure():
    """Ordered (explicit-pointer) BVH well-formedness: every node
    reachable exactly once from the root, leaves partition the primitive
    range, children contained in parents, left child nearer along the
    stored split axis."""
    import numpy as np

    from parallelraytracing_tpu.ops.pallas_trace import (
        _cluster_bounds, _cluster_stack_tree)

    rng = np.random.default_rng(11)
    n = 640
    mn = rng.uniform(-30, 30, (n, 3))
    mx = mn + rng.uniform(0.1, 5.0, (n, 3))
    csize = 8
    t = _cluster_stack_tree(_cluster_bounds(mn, mx, csize), n, csize)
    m = t.shape[1]
    leaf = t[6] < 0
    cover = np.zeros(n, np.int32)
    for s in np.nonzero(leaf)[0]:
        cover[int(t[7, s]):int(t[8, s])] += 1
    assert (cover == 1).all()
    seen = np.zeros(m, np.int32)
    stack = [0]
    while stack:
        s = stack.pop()
        seen[s] += 1
        if t[6, s] >= 0:
            stack += [int(t[6, s]), int(t[7, s])]
    assert (seen == 1).all()
    for s in np.nonzero(~leaf)[0]:
        l, r, ax = int(t[6, s]), int(t[7, s]), int(t[8, s])
        for c in (l, r):
            assert (t[:3, c] >= t[:3, s] - 1e-5).all()
            assert (t[3:6, c] <= t[3:6, s] + 1e-5).all()
        cl_ = (t[:3, l] + t[3:6, l]) * 0.5
        cr = (t[:3, r] + t[3:6, r]) * 0.5
        assert cl_[ax] <= cr[ax] + 1e-9


def test_traversal_modes_bit_identical():
    """linear / tree / ordered traversals are different SEARCH orders of
    the same closest-hit problem: images must be bit-identical."""
    import numpy as np

    from parallelraytracing_tpu.engines.fused import FusedRenderer

    def run(accel):
        cfg = small_cfg()
        scene = Scene(ScenePreset.RANDOM_BALLS_SMALL)
        film = Film(cfg.width, cfg.height)
        r = FusedRenderer.__new__(FusedRenderer)
        r.accel = accel
        r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
        for _ in range(2):
            r.progressive_render()
        return np.asarray(film.hdr_average())

    a = run("linear")
    assert np.array_equal(a, run("tree"))
    assert np.array_equal(a, run("ordered"))


def test_collect_stats_counters():
    """collect_stats returns sane per-tile counters: radiance unchanged,
    prims tested >= leaves entered, alive bounces within depth budget."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parallelraytracing_tpu.engines.fused import FusedRenderer
    from parallelraytracing_tpu.engines.megakernel import raygen
    from parallelraytracing_tpu.ops.pallas_trace import LANES, pallas_trace

    cfg = small_cfg()
    scene = Scene(ScenePreset.RANDOM_BALLS_SMALL)
    film = Film(cfg.width, cfg.height)
    r = FusedRenderer.__new__(FusedRenderer)
    r.accel = "tree"
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    base = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), jnp.uint32(0))
    skey = jax.random.fold_in(base, jnp.uint32(0))
    k_jit, k_path = jax.random.split(skey)
    from parallelraytracing_tpu.ops.rays import generate_camera_rays_ids
    jseed = jax.random.randint(k_jit, (), 0, 2**31 - 1,
                               jnp.int32).astype(jnp.uint32)
    o, d = generate_camera_rays_ids(r._cam_params, cfg.width, cfg.height,
                                    r._ids, None, cfg.jitter,
                                    pix_seed=jseed)
    pix = r._ids.astype(jnp.float32)
    seed = jnp.asarray([jax.random.randint(k_path, (), 0, 2**31 - 1,
                                           jnp.int32)], jnp.int32)
    t = r._tables
    args = (o, d, pix, t.sph, t.quad, t.tri, t.sph_cl,
            t.quad_cl, t.tri_cl, t.mats, t.lights, seed)
    kw = dict(rows=r.rows, max_depth=cfg.max_depth, t_min=cfg.t_min,
              t_max=cfg.t_max, sky=t.sky, interpret=r._interpret,
              vmem_kinds=t.vmem_kinds)
    plain = pallas_trace(*args, **kw)
    rad, stats = pallas_trace(*args, collect_stats=True, **kw)
    assert np.array_equal(np.asarray(plain), np.asarray(rad))
    s = np.asarray(stats)
    assert (s[:, 0] >= s[:, 1]).all()        # visited >= entered
    assert (s[:, 2] >= s[:, 1]).all()        # prims >= leaves
    assert (s[:, 3] >= 1).all() and (s[:, 3] <= cfg.max_depth).all()
    assert s[:, 2].sum() > 0


def test_plan_table_placement():
    """plan_table picks whole-SMEM / hot-cold split / all-VMEM by the
    PADDED SMEM footprint (rows pad to 8, columns to 128)."""
    import numpy as np

    from parallelraytracing_tpu.ops.pallas_trace import (
        LANES, SMEM_BYTES, plan_table, smem_padded_bytes)

    assert smem_padded_bytes((18, 10000)) == 24 * 10112 * 4   # measured
    assert smem_padded_bytes((9, 4999)) == 16 * 5120 * 4      # measured
    assert smem_padded_bytes((6, 1)) == 8 * 128 * 4

    tab = np.arange(27 * 300, dtype=np.float32).reshape(27, 300)
    # small: everything SMEM
    main, cold, vm, split, hot = plan_table(tab, 16, 0, 2048)
    assert cold is None and not vm and not split and hot is None
    assert np.array_equal(main, tab)
    # mid: hot/cold split — hot rows in SMEM, cold as VMEM rows
    main, cold, vm, split, hot = plan_table(tab, 16, 0, 64)
    assert split and not vm and hot is None
    assert main.shape == (16, 300) and np.array_equal(main, tab[:16])
    assert cold.shape == (300, LANES)
    assert np.array_equal(cold[:, :11], tab[16:].T)
    # large: the hot half alone busts the budget -> all-VMEM rows
    main, cold, vm, split, hot = plan_table(tab, 16, SMEM_BYTES, 64)
    assert vm and not split and cold is None and hot is None
    assert main.shape == (300, LANES)
    # large with headroom: hot/cold VMEM rows + the largest SMEM hot
    # PREFIX (leaf-dispatched in-kernel)
    big = np.arange(27 * 40000, dtype=np.float32).reshape(27, 40000) \
        .astype(np.float32)
    main, cold, vm, split, hot = plan_table(big, 16, 0, 64)
    assert vm and split
    assert main.shape == (40000, LANES)
    assert np.array_equal(main[:, :16], big[:16].T)
    assert cold.shape == (40000, LANES)
    assert np.array_equal(cold[:, :11], big[16:].T)
    assert hot is not None and hot.shape[0] == 16
    assert hot.shape[1] % 128 == 0 and hot.shape[1] >= 1024
    assert np.array_equal(hot, big[:16, :hot.shape[1]])
    from parallelraytracing_tpu.ops.pallas_trace import (SMEM_HEADROOM,
                                                         smem_padded_bytes)
    assert smem_padded_bytes(hot.shape) + SMEM_HEADROOM <= SMEM_BYTES
    # allow_partial=False (pallas_segment engines): oversize tables keep
    # the single merged VMEM-rows layout — the two-table split pushes the
    # segment kernel over the 16 MiB scoped-VMEM limit at dragon scale.
    main, cold, vm, split, hot = plan_table(big, 16, 0, 64,
                                            allow_partial=False)
    assert vm and not split and cold is None and hot is None
    assert main.shape == (40000, LANES)
    assert np.array_equal(main[:, :27], big.T)


def test_sah_tree_structure():
    """Binned-SAH threaded BVH: leaves partition the VALID primitives
    (invalid ones land outside every leaf run), escape links jump
    forward, parents contain their span's leaves, leaf boxes contain
    their primitives exactly."""
    import numpy as np

    from parallelraytracing_tpu.ops.pallas_trace import _sah_threaded_tree

    rng = np.random.default_rng(3)
    n = 2000
    mn = rng.uniform(-50, 50, (n, 3))
    mx = mn + rng.uniform(0.1, 4.0, (n, 3))
    inv = rng.choice(n, 100, replace=False)
    mn[inv] = 1.0
    mx[inv] = -1.0
    perm, t = _sah_threaded_tree(mn, mx, 4)
    m = t.shape[1]
    enc = t[7]
    miss = t[6]
    leaves = enc >= 0
    lo = enc.astype(np.int64) >> 6
    hi = lo + (enc.astype(np.int64) & 63)
    cover = np.zeros(n, np.int64)
    for s in np.nonzero(leaves)[0]:
        cover[lo[s]:hi[s]] += 1
    nv = n - 100
    assert (cover[:nv] == 1).all() and (cover[nv:] == 0).all()
    assert sorted(perm.tolist()) == list(range(n))
    vmask = (mn <= mx).all(1)
    assert vmask[perm[:nv]].all() and (~vmask[perm[nv:]]).all()
    idx = np.arange(m)
    assert ((miss > idx) | (miss == -1)).all()
    for s in np.nonzero(~leaves)[0]:
        end = int(miss[s]) if miss[s] >= 0 else m
        span = np.arange(s + 1, end)
        sl = span[leaves[span]]
        assert len(sl) > 0
        assert (t[:3, sl] >= t[:3, s:s + 1] - 1e-4).all()
        assert (t[3:6, sl] <= t[3:6, s:s + 1] + 1e-4).all()
    for s in np.nonzero(leaves)[0]:
        ids = perm[lo[s]:hi[s]]
        if len(ids):
            assert (mn[ids] >= t[:3, s][None] - 1e-4).all()
            assert (mx[ids] <= t[3:6, s][None] + 1e-4).all()


def test_tail_view_bit_identical_and_well_formed():
    """Straggler-tail traversal (TAIL_CLUSTER): the coarse and fine views
    share one leaf permutation, so switching views mid-frame cannot
    change the image — only where the walk cost goes.  Checks the
    combined table's fine view covers every primitive exactly once and
    that a traced frame is BIT-identical with the tail walk active."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parallelraytracing_tpu.ops.pallas_trace import (
        _sah_threaded_tree, pack_scene_tables, pallas_trace)

    # --- structural: both views partition the primitives exactly once
    rng = np.random.default_rng(3)
    n = 500
    mn = rng.uniform(-40, 40, (n, 3))
    mx = mn + rng.uniform(0.1, 3.0, (n, 3))
    perm, tree, troot = _sah_threaded_tree(mn, mx, 24, tail_csize=8)
    assert 0 < troot < tree.shape[1]
    for lo_col, hi_col in ((0, troot), (troot, tree.shape[1])):
        enc = tree[7, lo_col:hi_col]
        leaves = enc >= 0
        lo = (enc.astype(np.int64) >> 6)
        hi = lo + (enc.astype(np.int64) & 63)
        cover = np.zeros(n, np.int32)
        for s in np.nonzero(leaves)[0]:
            cover[int(lo[s]):int(hi[s])] += 1
        assert (cover == 1).all(), (lo_col, hi_col)
    # fine view has more leaves (thinner)
    n_coarse = (tree[7, :troot] >= 0).sum()
    n_fine = (tree[7, troot:] >= 0).sum()
    assert n_fine > n_coarse

    # --- behavioral: traced image identical with/without the tail walk
    scene = Scene(ScenePreset.RANDOM_BALLS_SMALL).build()
    cfg = small_cfg(width=64, height=32, max_depth=6)
    from parallelraytracing_tpu.core.camera import default_camera
    from parallelraytracing_tpu.ops.rays import generate_camera_rays
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    o, d = generate_camera_rays(cam, cfg.width, cfg.height, None, False)
    pix = jnp.arange(cfg.pixel_count, dtype=jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    sky = tuple(float(x) for x in np.asarray(scene.sky))

    imgs = []
    for tail in (0, 8):
        (sph, quad, tri, sph_cl, quad_cl, tri_cl, mats, troots,
         _, _, _, _) = pack_scene_tables(scene, accel="tree",
                                         tail_csize=tail)
        args = [jnp.asarray(a) for a in
                (sph, quad, tri, sph_cl, quad_cl, tri_cl, mats)]
        rad = pallas_trace(
            o, d, pix, *args, jnp.zeros((18, 1), jnp.float32), seed,
            rows=2, max_depth=cfg.max_depth, t_min=cfg.t_min,
            t_max=cfg.t_max, sky=sky, interpret=True,
            tail_roots=tuple(troots) if tail else None, tail_depth=3)
        imgs.append(np.asarray(rad))
        if tail:
            assert troots[0] > 0  # sphere tree really has a fine view
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_partial_hot_prefix_bit_identical(monkeypatch):
    """plan_table's large case (dragon-scale meshes): the triangle table
    goes to VMEM rows PLUS an SMEM hot PREFIX read through
    make_partial_reader.  Same values, different port: the image must be
    bit-identical to the pure VMEM-rows table."""
    import dataclasses

    import parallelraytracing_tpu.ops.pallas_trace as pt
    from parallelraytracing_tpu.core.mesh import Mesh
    from parallelraytracing_tpu.engines.tables import (build_scene_tables,
                                                       trace_tables)
    from parallelraytracing_tpu.ops.rays import generate_camera_rays_ids

    # ~1.5k-triangle soup in front of the camera
    rng = np.random.default_rng(7)
    n_tri = 1500
    p0 = rng.uniform(-4, 4, (n_tri, 3)).astype(np.float32)
    e = rng.uniform(0.05, 0.5, (n_tri, 2, 3)).astype(np.float32)
    verts = np.concatenate([p0, p0 + e[:, 0], p0 + e[:, 1]], axis=0)
    k = np.arange(n_tri, dtype=np.uint32)
    mesh = Mesh(vertices=verts,
                indices=np.stack([k, k + n_tri, k + 2 * n_tri], 1).ravel())
    mesh.compute_vertex_normals()
    s = Scene(preset=None)
    m = s.add_lambertian((0.7, 0.6, 0.5))
    s.add_mesh(mesh, m, ((1, 1, 1), (0, 0, 0), (0, 0, 0)))

    cfg = small_cfg(max_depth=4, jitter=False)
    # shrink the budget so the (16, ~1536) hot table can't fit whole but
    # a >=1024-column prefix can
    monkeypatch.setattr(pt, "SMEM_BYTES", 240 * 1024)
    t_hot, _ = build_scene_tables(s, cfg, vmem_threshold=64)
    assert t_hot.vmem_kinds[2] and t_hot.tri_hot is not None
    assert t_hot.tri_hot.shape[0] == 16
    assert 1024 <= t_hot.tri_hot.shape[1] < t_hot.tri.shape[0]
    t_plain = dataclasses.replace(t_hot, tri_hot=None)

    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    ids = jnp.arange(cfg.pixel_count, dtype=jnp.int32)
    o, d = generate_camera_rays_ids(cam, cfg.width, cfg.height, ids,
                                    None, False)
    pix = ids.astype(jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    a = np.asarray(trace_tables(t_hot, o, d, pix, seed, 8, cfg, True))
    b = np.asarray(trace_tables(t_plain, o, d, pix, seed, 8, cfg, True))
    assert np.isfinite(a).all()
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_sbvh_spatial_splits():
    """SBVH build (sbvh_alpha > 0): straddling primitives may be
    REFERENCED from several leaves with plane-clipped bounds.  Checks
    the reference list covers every valid primitive at least once and
    stays under the duplication cap, invalid primitives stay outside
    every leaf run, the packed leaf encoding is well-formed — and that
    a traced frame is BIT-identical to the single-reference SAH tree
    (same winner t and global ordinal per hit, so duplication cannot
    change the closest-hit fold)."""
    import numpy as np

    import parallelraytracing_tpu.ops.pallas_trace as pt

    rng = np.random.default_rng(7)
    n = 1500
    # long thin boxes (diagonal-prim pathology: the SBVH target)
    mn = rng.uniform(-40, 40, (n, 3))
    ext = rng.uniform(0.05, 0.5, (n, 3))
    ax = rng.integers(0, 3, n)
    ext[np.arange(n), ax] = rng.uniform(5.0, 25.0, n)
    mx = mn + ext
    inv = rng.choice(n, 80, replace=False)
    mn[inv] = 1.0
    mx[inv] = -1.0
    refs, t = pt._sah_threaded_tree(mn, mx, 4, sbvh_alpha=1e-5)
    nv = n - 80
    assert len(refs) >= n and len(refs) <= int(1.4 * nv) + 80
    vmask = (mn <= mx).all(1)
    # every valid primitive appears; leaf runs reference only valid ones
    enc = t[7][t[7] >= 0].astype(np.int64)
    lo, hi = enc >> 6, (enc >> 6) + (enc & 63)
    covered = np.zeros(len(refs), bool)
    for l, h in zip(lo, hi):
        covered[l:h] = True
    in_leaves = set(refs[covered].tolist())
    assert in_leaves == set(np.nonzero(vmask)[0].tolist())
    assert hi.max() <= len(refs)

    # --- bit-identity on a real mesh render (interpret mode)
    import jax

    from parallelraytracing_tpu import Film, RenderConfig, Scene
    from parallelraytracing_tpu.core.camera import Camera
    from parallelraytracing_tpu.core.mesh import load_ply
    from parallelraytracing_tpu.engines.fused import FusedRenderer

    def render(alpha):
        old = pt.SBVH_ALPHA
        pt.SBVH_ALPHA = alpha
        try:
            mesh = load_ply(
                "/root/reference/assets/models/icosahedron.ply")
            scene = Scene(preset=None)
            mat = scene.add_lambertian((0.75, 0.65, 0.5))
            scene.add_mesh(mesh, mat, ((4, 4, 4), (0, 30, 0), (0, 4, 0)))
            g = scene.add_lambertian((0.5, 0.5, 0.5))
            scene.add_quad(50, 50, g, None)
            light = scene.add_emissive((10, 10, 10))
            scene.add_sphere(2.0, light, ((1, 1, 1), (0, 0, 0),
                                          (8, 15, 8)))
            cfg = RenderConfig(width=96, height=64, max_depth=4, seed=0)
            film = Film(cfg.width, cfg.height)
            r = FusedRenderer.__new__(FusedRenderer)
            r.accel = "tree"
            r.sub_rows = 0
            eye = np.array([0., 8., 16.])
            cam = Camera(eye, np.array([0., 4., 0.]) - eye, 96., 64.,
                         100.)
            r.init(film, scene, cam, cfg)
            r.progressive_render()
            return np.asarray(film.hdr_average())
        finally:
            pt.SBVH_ALPHA = old

    a = render(0.0)
    b = render(1e-5)
    np.testing.assert_array_equal(a, b)


def test_collapse_tau_splice():
    """Nearly-always-hit node splice (collapse_tau > 0): internal nodes
    whose area is >= tau x the parent's are removed from the threaded
    table; children attach to the parent via the (arity-agnostic)
    escape links.  The leaf runs and primitive permutation must be
    UNCHANGED (bit-identical traversal), the table strictly smaller,
    links well-formed — and a traced mesh frame bit-identical."""
    import parallelraytracing_tpu.ops.pallas_trace as pt

    rng = np.random.default_rng(11)
    n = 2000
    mn = rng.uniform(-50, 50, (n, 3))
    mx = mn + rng.uniform(0.1, 6.0, (n, 3))
    perm0, t0 = pt._sah_threaded_tree(mn, mx, 4)
    perm1, t1 = pt._sah_threaded_tree(mn, mx, 4, collapse_tau=0.5)
    assert np.array_equal(perm0, perm1)  # splice touches topology only
    assert t1.shape[1] < t0.shape[1]     # nodes really got removed

    def leaf_runs(t):
        enc = t[7][t[7] >= 0].astype(np.int64)
        return sorted(zip((enc >> 6).tolist(), (enc & 63).tolist()))

    assert leaf_runs(t0) == leaf_runs(t1)  # identical primitive schedule
    m = t1.shape[1]
    miss = t1[6]
    idx = np.arange(m)
    assert ((miss > idx) | (miss == -1)).all()
    # escape-link reachability: an always-enter walk visits every column
    # exactly once (preorder), an always-miss walk terminates
    node, seen = 0, 0
    while node >= 0 and seen <= m:
        seen += 1
        node = node + 1 if t1[7, node] < 0 else int(miss[node])
        if node >= m:
            break
    # children boxes contained in parent span (same property as the
    # binary tree: a node's subtree lies between it and its miss link)
    leaves = t1[7] >= 0
    for s in np.nonzero(~leaves)[0]:
        end = int(miss[s]) if miss[s] >= 0 else m
        span = np.arange(s + 1, end)
        sl = span[leaves[span]]
        assert len(sl) > 0
        assert (t1[:3, sl] >= t1[:3, s:s + 1] - 1e-4).all()
        assert (t1[3:6, sl] <= t1[3:6, s:s + 1] + 1e-4).all()

    # --- bit-identity on a real mesh render (interpret mode)
    from parallelraytracing_tpu import Film, RenderConfig, Scene
    from parallelraytracing_tpu.core.camera import Camera
    from parallelraytracing_tpu.core.mesh import load_ply
    from parallelraytracing_tpu.engines.fused import FusedRenderer

    def render(tau):
        old = pt.COLLAPSE_TAU
        pt.COLLAPSE_TAU = tau
        try:
            mesh = load_ply(
                "/root/reference/assets/models/icosahedron.ply")
            scene = Scene(preset=None)
            mat = scene.add_lambertian((0.75, 0.65, 0.5))
            scene.add_mesh(mesh, mat, ((4, 4, 4), (0, 30, 0), (0, 4, 0)))
            g = scene.add_lambertian((0.5, 0.5, 0.5))
            scene.add_quad(50, 50, g, None)
            light = scene.add_emissive((10, 10, 10))
            scene.add_sphere(2.0, light, ((1, 1, 1), (0, 0, 0),
                                          (8, 15, 8)))
            cfg = RenderConfig(width=96, height=64, max_depth=4, seed=0)
            film = Film(cfg.width, cfg.height)
            r = FusedRenderer.__new__(FusedRenderer)
            r.accel = "tree"
            r.sub_rows = 0
            eye = np.array([0., 8., 16.])
            cam = Camera(eye, np.array([0., 4., 0.]) - eye, 96., 64.,
                         100.)
            r.init(film, scene, cam, cfg)
            r.progressive_render()
            return np.asarray(film.hdr_average())
        finally:
            pt.COLLAPSE_TAU = old

    a = render(0.0)
    b = render(0.5)
    np.testing.assert_array_equal(a, b)

def test_collapse_abs_splice():
    """Absolute-area splice companion (collapse_abs > 0): nodes whose
    area is >= abs x the ROOT's are spliced even when their
    parent-ratio sits below tau (top-of-tree nodes are near-certain
    whole-tile hits).  Same invariants as the tau splice: permutation
    and leaf runs unchanged, table strictly smaller, links
    well-formed."""
    import parallelraytracing_tpu.ops.pallas_trace as pt

    rng = np.random.default_rng(23)
    n = 2000
    mn = rng.uniform(-50, 50, (n, 3))
    mx = mn + rng.uniform(0.1, 6.0, (n, 3))
    perm0, t0 = pt._sah_threaded_tree(mn, mx, 4, collapse_tau=0.6)
    perm1, t1 = pt._sah_threaded_tree(mn, mx, 4, collapse_tau=0.6,
                                      collapse_abs=0.02)
    assert np.array_equal(perm0, perm1)
    assert t1.shape[1] < t0.shape[1]

    def leaf_runs(t):
        enc = t[7][t[7] >= 0].astype(np.int64)
        return sorted(zip((enc >> 6).tolist(), (enc & 63).tolist()))

    assert leaf_runs(t0) == leaf_runs(t1)
    m = t1.shape[1]
    miss = t1[6]
    idx = np.arange(m)
    assert ((miss > idx) | (miss == -1)).all()
    # containment: every leaf under an internal node stays inside it
    leaves = t1[7] >= 0
    for s in np.nonzero(~leaves)[0]:
        end = int(miss[s]) if miss[s] >= 0 else m
        span = np.arange(s + 1, end)
        sl = span[leaves[span]]
        assert len(sl) > 0
        assert (t1[:3, sl] >= t1[:3, s:s + 1] - 1e-4).all()
        assert (t1[3:6, sl] <= t1[3:6, s:s + 1] + 1e-4).all()


def test_tile_sah_cost_model():
    """Tile-SAH build (tile_k > 0): split costs saturate each child's
    entry probability at 1 (the whole-tile ANY-LANE union).  Unlike the
    splices this changes split SELECTION, so the permutation and leaf
    runs may differ from classic SAH — the invariants are structural
    (well-formed links, parent containment, every valid primitive in
    exactly one leaf run) plus a bit-identical rendered image (the
    global-ordinal winner fold makes closest-hit tree-independent)."""
    import parallelraytracing_tpu.ops.pallas_trace as pt

    rng = np.random.default_rng(37)
    n = 2000
    mn = rng.uniform(-50, 50, (n, 3))
    mx = mn + rng.uniform(0.1, 6.0, (n, 3))
    perm1, t1 = pt._sah_threaded_tree(mn, mx, 4, tile_k=20.0)

    m = t1.shape[1]
    miss = t1[6]
    idx = np.arange(m)
    assert ((miss > idx) | (miss == -1)).all()
    leaves = t1[7] >= 0
    # every valid primitive appears exactly once across leaf runs
    enc = t1[7][leaves].astype(np.int64)
    covered = np.concatenate([np.arange(lo, lo + sp) for lo, sp in
                              zip((enc >> 6), (enc & 63))])
    assert len(covered) == len(np.unique(covered)) == n
    for s in np.nonzero(~leaves)[0]:
        end = int(miss[s]) if miss[s] >= 0 else m
        span = np.arange(s + 1, end)
        sl = span[leaves[span]]
        assert len(sl) > 0
        assert (t1[:3, sl] >= t1[:3, s:s + 1] - 1e-4).all()
        assert (t1[3:6, sl] <= t1[3:6, s:s + 1] + 1e-4).all()

    # --- bit-identity on a real mesh render (interpret mode)
    from parallelraytracing_tpu import Film, RenderConfig, Scene
    from parallelraytracing_tpu.core.camera import Camera
    from parallelraytracing_tpu.core.mesh import load_ply
    from parallelraytracing_tpu.engines.fused import FusedRenderer

    def render(k):
        old = pt.TILE_SAH_K
        pt.TILE_SAH_K = k
        try:
            mesh = load_ply(
                "/root/reference/assets/models/icosahedron.ply")
            scene = Scene(preset=None)
            mat = scene.add_lambertian((0.75, 0.65, 0.5))
            scene.add_mesh(mesh, mat, ((4, 4, 4), (0, 30, 0), (0, 4, 0)))
            g = scene.add_lambertian((0.5, 0.5, 0.5))
            scene.add_quad(50, 50, g, None)
            light = scene.add_emissive((10, 10, 10))
            scene.add_sphere(2.0, light, ((1, 1, 1), (0, 0, 0),
                                          (8, 15, 8)))
            cfg = RenderConfig(width=96, height=64, max_depth=4, seed=0)
            film = Film(cfg.width, cfg.height)
            r = FusedRenderer.__new__(FusedRenderer)
            r.accel = "tree"
            r.sub_rows = 0
            eye = np.array([0., 8., 16.])
            cam = Camera(eye, np.array([0., 4., 0.]) - eye, 96., 64.,
                         100.)
            r.init(film, scene, cam, cfg)
            r.progressive_render()
            return np.asarray(film.hdr_average())
        finally:
            pt.TILE_SAH_K = old

    np.testing.assert_array_equal(render(0.0), render(20.0))


def test_set_camera_repack_policy():
    """Camera moves must repack the Pallas tables ONLY when a table
    actually depends on the eye (a linear-scan kind with >1 cluster took
    front-to-back ordering).  Tree-mode tables are camera-independent,
    so the viewer's warm-engine cache and per-frame orbit moves must not
    pay the host-side rebuild (identity of _tables is the repack probe)."""
    from parallelraytracing_tpu.core.camera import Camera
    from parallelraytracing_tpu.engines.fused import FusedRenderer

    def mk(accel):
        cfg = RenderConfig(width=48, height=32, max_depth=2, seed=0)
        film = Film(cfg.width, cfg.height)
        r = FusedRenderer.__new__(FusedRenderer)
        r.accel = accel
        r.sub_rows = 0
        r.front_to_back = True
        r.init(film, Scene(ScenePreset.RANDOM_BALLS_SMALL),
               default_camera(cfg.width, cfg.height), cfg)
        return r

    def cam(eye):
        eye = np.asarray(eye, np.float64)
        return Camera(eye, -eye, 48.0, 32.0, 100.0)

    # SAH tree: static tables — no repack even when the eye moves.
    r = mk("tree")
    assert not r._tables.eye_dependent
    t0 = r._tables
    r.set_camera(cam([9.0, 5.0, 9.0]))
    assert r._tables is t0

    # Linear scan (>1 cluster): front-to-back order is eye-dependent —
    # a MOVED eye repacks, an unchanged eye does not (warm-cache path).
    r = mk("linear")
    assert r._tables.eye_dependent
    t0 = r._tables
    r.set_camera(cam(np.asarray(r._camera.position, np.float64)))
    assert r._tables is t0
    r.set_camera(cam([9.0, 5.0, 9.0]))
    assert r._tables is not t0


def test_depth_sort_is_bit_invariant():
    """PRT_DEPTH_SORT (depth-probe ray reordering, engines/fused.py):
    any per-frame ray permutation renders the bit-identical image by the
    pixel-keyed RNG contract — global and block-local variants both."""
    import numpy as np

    from parallelraytracing_tpu import Film, RenderConfig, Scene, ScenePreset
    from parallelraytracing_tpu.core.camera import default_camera
    from parallelraytracing_tpu.engines.fused import FusedRenderer

    cfg = RenderConfig(width=64, height=32, max_depth=5, seed=2)
    scene = Scene(ScenePreset.MATERIAL_TEST)
    cam = default_camera(cfg.width, cfg.height)

    def render(ds):
        film = Film(cfg.width, cfg.height)
        r = FusedRenderer.__new__(FusedRenderer)
        r.rows = 8
        r.depth_sort = ds
        r.init(film, scene, cam, cfg)
        for _ in range(2):
            r.progressive_render()
        return np.asarray(film.hdr_average())

    a = render(0)
    np.testing.assert_array_equal(a, render(1))    # global depth major
    np.testing.assert_array_equal(a, render(10))   # block-local
