"""Streamed big-mesh path (ops/pallas_trace STREAM_THRESHOLD /
STREAM_CHUNK): triangles ride HBM as (rows, 128) and chunk-aligned SAH
leaves DMA into VMEM scratch on entry — the layout that lifts both the
2^18 packed-leaf cap and the ~25k-triangle VMEM-residency wall (the
reference's OptiX backend builds GASes at any size through its own
memory manager, optix/renderer.cpp:703-765; its CPU/CUDA backends are
brute-force and size-free).

Contract under test: the stream path tests a SUPERSET of each leaf's
primitives (full chunk rows incl. never-hit pads), and the closest-hit
fold is a pure min with global-ordinal tie-break — so images must be
BIT-IDENTICAL to the dense path."""

import numpy as np
import pytest

from parallelraytracing_tpu import Film, RenderConfig, Scene, create_renderer
from parallelraytracing_tpu.core.camera import Camera
from parallelraytracing_tpu.core.mesh import load_ply, subdivide

pytestmark = pytest.mark.slow  # Pallas interpret-mode renders

ICO = "/root/reference/assets/models/icosahedron.ply"


def _scene():
    ico2 = subdivide(load_ply(ICO), 2)  # 320 tris
    s = Scene(preset=None)
    red = s.add_lambertian((0.8, 0.2, 0.1))
    s.add_mesh(ico2, red, ((2.0,) * 3, (0, 20, 0), (0, 2, 0)))
    g = s.add_lambertian((0.5, 0.5, 0.55))
    s.add_quad(30, 30, g, None)
    li = s.add_emissive((9, 9, 8))
    s.add_sphere(2.0, li, ((1, 1, 1), (0, 0, 0), (6, 10, 6)))
    return s


def _render(engine, threshold, monkeypatch):
    import parallelraytracing_tpu.ops.pallas_trace as pt
    monkeypatch.setattr(pt, "STREAM_THRESHOLD", threshold)
    monkeypatch.setattr(pt, "STREAM_CHUNK", 32)
    cam = Camera(np.array([0.0, 4.0, 10.0]),
                 np.array([0.0, -2.5, -10.0]), 64.0, 48.0, 100.0)
    cfg = RenderConfig(width=64, height=48, max_depth=6, seed=0)
    film = Film(64, 48)
    r = create_renderer(engine)
    r.init(film, _scene(), cam, cfg)
    for _ in range(2):
        r.progressive_render()
    return r, np.asarray(film.hdr_average())


@pytest.mark.parametrize("engine", ["wavefront_fused", "fused"])
def test_stream_bit_identical_to_dense(engine, monkeypatch):
    r_s, img_s = _render(engine, 64, monkeypatch)       # streamed
    assert r_s._tables.tri_stream == 32
    r_d, img_d = _render(engine, 1 << 30, monkeypatch)  # dense
    assert r_d._tables.tri_stream == 0
    assert np.array_equal(img_s, img_d)


def test_subdivide_preserves_surface():
    m = load_ply(ICO)
    s = subdivide(m, 2)
    assert s.num_triangles == m.num_triangles * 16

    def area(mm):
        v = mm.vertices.astype(np.float64)
        i = mm.indices.reshape(-1, 3)
        return float(np.linalg.norm(
            np.cross(v[i[:, 1]] - v[i[:, 0]], v[i[:, 2]] - v[i[:, 0]]),
            axis=1).sum() / 2)

    # midpoints are stored f32, so planar-area preservation holds to
    # f32 rounding, not exactly
    assert abs(area(m) - area(s)) < 1e-5 * max(1.0, area(m))
    assert np.allclose(m.vertices.min(0), s.vertices.min(0))
    assert np.allclose(m.vertices.max(0), s.vertices.max(0))
    # midpoint normals are linear blends: magnitudes stay within the
    # source range (icosahedron.ply carries NON-unit normals)
    src = np.linalg.norm(m.normals, axis=1)
    out = np.linalg.norm(s.normals, axis=1)
    assert out.max() <= src.max() + 1e-4 and out.min() >= 0.0


def test_stream_leaf_encoding_roundtrip():
    """Chunk-aligned leaves: lo aligned, enc = chunk_idx*mult + span."""
    import parallelraytracing_tpu.ops.pallas_trace as pt
    rng = np.random.default_rng(3)
    n = 500
    c = rng.random((n, 3)) * 10
    mn = c - 0.1
    mx = c + 0.1
    chunk = 32
    perm, tree = pt._sah_threaded_tree(mn, mx, chunk, align=chunk)
    mult = 1 << int(np.ceil(np.log2(chunk + 1)))
    leaves = tree[7][tree[7] >= 0].astype(np.int64)
    spans = leaves % mult
    los = (leaves // mult) * chunk
    assert (spans <= chunk).all() and (spans > 0).any()
    # every real primitive appears exactly once inside some leaf run
    real = perm[perm >= 0]
    assert sorted(real.tolist()) == list(range(n))
    covered = set()
    for lo, sp in zip(los, spans):
        covered.update(int(p) for p in perm[lo:lo + sp] if p >= 0)
    assert covered == set(range(n))
