"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu import RenderConfig, Scene, ScenePreset
from parallelraytracing_tpu.core.camera import default_camera
from parallelraytracing_tpu.engines.megakernel import raygen, trace
from parallelraytracing_tpu.parallel.sharding import (
    make_render_mesh, render_frame_sharded_jit, shard_block_size)

pytestmark = pytest.mark.slow  # 8-virtual-device shard_map renders


def small_cfg(**kw):
    base = dict(width=32, height=16, max_depth=4, samples_per_frame=1,
                seed=3, intersect_chunk=16, ray_tile=1 << 10, jitter=False)
    base.update(kw)
    return RenderConfig(**base)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("px,spp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_mesh_shapes(px, spp):
    mesh = make_render_mesh(spp_axis=spp)
    assert mesh.shape == {"px": px, "spp": spp}


def test_sharded_render_matches_single_device():
    cfg = small_cfg()
    scene = Scene(ScenePreset.MATERIAL_TEST).build()
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    key = jax.random.PRNGKey(0)

    mesh = make_render_mesh(spp_axis=1)  # 8-way pixel sharding
    sharded = np.asarray(render_frame_sharded_jit(scene, cam, key, cfg, mesh))

    # Single-device reference with identical per-shard RNG: px-shard i uses
    # fold_in(fold_in(key, i), 0) then fold_in(.., sample); replicate that.
    blk = shard_block_size(cfg, mesh)
    ref = np.zeros((cfg.pixel_count, 3), np.float32)
    from parallelraytracing_tpu.engines.tracer import trace_paths_tiled
    from parallelraytracing_tpu.ops.rays import generate_camera_rays_flat
    for i in range(mesh.shape["px"]):
        dev_key = jax.random.fold_in(jax.random.fold_in(key, i), 0)
        skey = jax.random.fold_in(dev_key, 0)
        k_jit, k_path = jax.random.split(skey)
        o, d = generate_camera_rays_flat(cam, cfg.width, cfg.height,
                                         i * blk, blk, k_jit, cfg.jitter)
        out = np.asarray(trace_paths_tiled(scene, o, d, k_path, cfg))
        lo, hi = i * blk, min((i + 1) * blk, cfg.pixel_count)
        ref[lo:hi] = out[:hi - lo]

    np.testing.assert_allclose(sharded, ref, rtol=1e-5, atol=1e-5)


def test_spp_axis_averages_sample_streams():
    cfg = small_cfg(jitter=True)
    scene = Scene(ScenePreset.CORNELL).build()
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    key = jax.random.PRNGKey(1)

    mesh81 = make_render_mesh(spp_axis=1)
    mesh24 = make_render_mesh(spp_axis=4)
    a = np.asarray(render_frame_sharded_jit(scene, cam, key, cfg, mesh81))
    b = np.asarray(render_frame_sharded_jit(scene, cam, key, cfg, mesh24))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # 4 sample streams averaged -> same expectation, lower variance; means
    # must agree statistically
    assert abs(a.mean() - b.mean()) < 0.05
    # and b really is an average of distinct streams, not a copy
    assert not np.allclose(a, b)


def test_sharded_output_is_px_sharded():
    cfg = small_cfg()
    scene = Scene(ScenePreset.MATERIAL_TEST).build()
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    mesh = make_render_mesh(spp_axis=2)
    out = render_frame_sharded_jit(scene, cam, jax.random.PRNGKey(0), cfg, mesh)
    assert out.shape == (cfg.pixel_count, 3)
    # the result actually lives distributed over the px axis
    assert len(out.sharding.device_set) == 8 or len(out.sharding.device_set) == 4


def test_sharded_fused_kernel_runs_on_mesh():
    from parallelraytracing_tpu.engines.tables import build_scene_tables
    from parallelraytracing_tpu.parallel.sharding import \
        render_frame_sharded_fused

    cfg = small_cfg(width=64, height=32, max_depth=4)
    tables, _ = build_scene_tables(Scene(ScenePreset.MATERIAL_TEST), cfg)
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    mesh = make_render_mesh(spp_axis=2)
    out = render_frame_sharded_fused(tables, cam, jax.random.PRNGKey(0),
                                     cfg, mesh, rows=2, interpret=True)
    out = np.asarray(out)
    assert out.shape == (cfg.pixel_count, 3)
    assert np.isfinite(out).all() and out.mean() > 0.1


def test_sharded_fused_invariant_to_device_count_and_layout():
    """Determinism contract (ADVICE r2): path + jitter seeds derive from
    the frame key only and RNG/jitter are keyed on GLOBAL pixel ids, so
    for a fixed spp-axis size the image is BIT-invariant to the number
    of px shards and to the pixel permutation."""
    from parallelraytracing_tpu.engines.fused import morton_pixel_perm
    from parallelraytracing_tpu.engines.tables import build_scene_tables
    from parallelraytracing_tpu.parallel.sharding import \
        render_frame_sharded_fused

    cfg = small_cfg(width=64, height=32, max_depth=4, jitter=True)
    tables, _ = build_scene_tables(Scene(ScenePreset.MATERIAL_TEST), cfg)
    cam = jnp.asarray(default_camera(cfg.width, cfg.height).ray_params())
    key = jax.random.PRNGKey(7)

    imgs = []
    # n_dev=1 exercises the degenerate no-shard_map fast path, which must
    # also be bit-identical (same device-independent streams).
    for n_dev in (1, 2, 8):
        mesh = make_render_mesh(jax.devices()[:n_dev], spp_axis=1)
        imgs.append(np.asarray(render_frame_sharded_fused(
            tables, cam, key, cfg, mesh, rows=2, interpret=True)))
    # Morton-permuted shard blocks (the production layout)
    mesh = make_render_mesh(spp_axis=1)
    r = cfg.pixel_count
    blk = -(-r // mesh.shape["px"])
    blk += (-blk) % (2 * 128)
    mperm, minv = morton_pixel_perm(cfg.width, cfg.height)
    perm = jnp.asarray(np.concatenate(
        [mperm, np.arange(r, mesh.shape["px"] * blk)]).astype(np.int32))
    imgs.append(np.asarray(render_frame_sharded_fused(
        tables, cam, key, cfg, mesh, rows=2, interpret=True,
        perm=perm, inv=jnp.asarray(minv))))
    for other in imgs[1:]:
        np.testing.assert_array_equal(imgs[0], other)


def _render_engine(engine, scene, cfg, frames=3, **attrs):
    from parallelraytracing_tpu import Film, create_renderer
    film = Film(cfg.width, cfg.height)
    r = create_renderer(engine)
    for k, v in attrs.items():
        setattr(r, k, v)
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    for _ in range(frames):
        r.progressive_render()
    return np.asarray(film.hdr_average())


def test_sharded_engine_bitmatches_fused_without_jitter():
    """Full-parity gate (VERDICT r2 item 2): with jitter off, the
    sharded engine's image over the 8-device mesh equals the fused
    engine's single-device image BIT FOR BIT (same pixel-keyed PCG
    streams, device-independent frame seed)."""
    cfg = RenderConfig(width=64, height=32, max_depth=4, seed=5,
                       jitter=False)
    a = _render_engine("sharded", Scene(ScenePreset.MATERIAL_TEST), cfg,
                       rows=2)
    b = _render_engine("fused", Scene(ScenePreset.MATERIAL_TEST), cfg,
                       rows=2)
    np.testing.assert_array_equal(a, b)


def test_sharded_engine_mesh_scene_matches_fused():
    """Triangle tables (incl. the hot/cold split machinery) work under
    shard_map: a PLY-mesh scene renders identically to fused."""
    from parallelraytracing_tpu.core.mesh import load_ply
    mesh = load_ply("/root/reference/assets/models/icosahedron.ply")

    def make():
        s = Scene(preset=None)
        m = s.add_lambertian((0.8, 0.3, 0.2))
        s.add_mesh(mesh, m, ((1.5, 1.5, 1.5), (0, 20, 0), (0, 1, 0)))
        g = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_quad(30, 30, g, None)
        light = s.add_emissive((8, 8, 8))
        s.add_sphere(1.0, light, ((1, 1, 1), (0, 0, 0), (3, 7, 3)))
        return s

    cfg = RenderConfig(width=48, height=32, max_depth=4, seed=2,
                       jitter=False)
    a = _render_engine("sharded", make(), cfg, rows=2, frames=2)
    b = _render_engine("fused", make(), cfg, rows=2, frames=2)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)


def test_sharded_engine_instanced_scene_matches_fused():
    """In-kernel TLAS/BLAS instancing works under shard_map (the r2
    sharded engine silently rendered the baked copy): geometry stays
    ∝ unique meshes AND the image equals fused."""
    from parallelraytracing_tpu.core.mesh import load_ply

    def instanced_scene():
        mesh = load_ply("/root/reference/assets/models/icosahedron.ply")
        s = Scene(preset=None)
        red = s.add_lambertian((0.9, 0.2, 0.2))
        metal = s.add_metal((0.9, 0.9, 0.9), 0.05)
        s.add_mesh_instances(
            mesh, red, [((1, 1, 1), (0, 30 * i, 0), (i * 3.0 - 3.0, 1, 0))
                        for i in range(3)])
        s.add_mesh_instances(mesh, metal,
                             [((2, 2, 2), (0, 0, 45), (0, 2, -4))])
        g = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_quad(30, 30, g, None)
        light = s.add_emissive((10, 10, 10))
        s.add_sphere(1.0, light, ((1, 1, 1), (0, 0, 0), (4, 8, 4)))
        return s, mesh

    cfg = RenderConfig(width=48, height=32, max_depth=4, seed=5,
                       jitter=False)
    s, mesh = instanced_scene()
    from parallelraytracing_tpu import Film, create_renderer
    film = Film(cfg.width, cfg.height)
    r = create_renderer("sharded")
    r.rows = 2
    r.init(film, s, default_camera(cfg.width, cfg.height), cfg)
    assert r._tables.inst is not None
    n_unique = len(np.asarray(mesh.indices)) // 3
    assert np.asarray(r._tables.inst[0]).shape[1] == n_unique
    assert int(np.asarray(r._scene_data.tri_valid).sum()) == 0
    for _ in range(2):
        r.progressive_render()
    a = np.asarray(film.hdr_average())

    s2, _ = instanced_scene()
    b = _render_engine("fused", s2, cfg, rows=2, frames=2)
    np.testing.assert_array_equal(a, b)


def test_sharded_engine_nee_matches_fused():
    """cfg.nee routes into the sharded kernel (it silently no-opped in
    r2): the NEE image equals fused's NEE image and differs from the
    non-NEE image."""
    cfg = RenderConfig(width=48, height=32, max_depth=4, seed=1,
                       jitter=False, nee=True)
    a = _render_engine("sharded", Scene(ScenePreset.CORNELL), cfg,
                       rows=2, frames=2)
    b = _render_engine("fused", Scene(ScenePreset.CORNELL), cfg,
                       rows=2, frames=2)
    # Same samples; XLA reassociates the NEE contribution's multiply
    # chain differently under shard_map, so agreement is to float
    # tolerance (~1e-7 observed), not bitwise like the non-NEE configs.
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    c = _render_engine("sharded", Scene(ScenePreset.CORNELL),
                       cfg.replace(nee=False), rows=2, frames=2)
    assert np.abs(a - c).max() > 1e-4


def test_sharded_engine_end_to_end():
    """The `sharded` engine (multi-chip fused megakernel as a first-class
    engine) renders through the standard Renderer protocol on the 8-device
    virtual mesh: finite image, progressive accumulation, and statistical
    agreement with the single-device oracle."""
    import numpy as np

    from parallelraytracing_tpu import (Film, RenderConfig, Scene,
                                        ScenePreset, create_renderer)
    from parallelraytracing_tpu.core.camera import default_camera

    cfg = RenderConfig(width=64, height=32, max_depth=4, seed=5)
    scene = Scene(ScenePreset.MATERIAL_TEST)

    film = Film(cfg.width, cfg.height)
    r = create_renderer("sharded")
    r.init(film, scene, default_camera(cfg.width, cfg.height), cfg)
    assert r._mesh.devices.size == 8
    for _ in range(8):
        r.progressive_render()
    img = np.asarray(film.hdr_average())
    assert np.isfinite(img).all() and (img >= 0).all()
    assert film.sample_count == 8

    film2 = Film(cfg.width, cfg.height)
    o = create_renderer("megakernel")
    o.init(film2, scene, default_camera(cfg.width, cfg.height), cfg)
    for _ in range(8):
        o.progressive_render()
    ref = np.asarray(film2.hdr_average())
    # different RNG streams: statistical agreement
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.1


def test_sharded_segmented_bitmatches_wavefront_fused():
    """The SEGMENTED multi-chip path (per-device compaction + re-sort
    between bounce segments, render_frame_sharded_segmented): the
    8-device image equals the single-chip wavefront_fused engine's BIT
    FOR BIT — device-local argsort compaction cannot change pixel-keyed
    streams, and the shard layout cannot change global pixel ids."""
    from parallelraytracing_tpu.core.mesh import load_ply
    mesh = load_ply("/root/reference/assets/models/icosahedron.ply")

    def make():
        s = Scene(preset=None)
        m = s.add_lambertian((0.8, 0.3, 0.2))
        s.add_mesh(mesh, m, ((1.5, 1.5, 1.5), (0, 20, 0), (0, 1, 0)))
        g = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_quad(30, 30, g, None)
        light = s.add_emissive((8, 8, 8))
        s.add_sphere(1.0, light, ((1, 1, 1), (0, 0, 0), (3, 7, 3)))
        return s

    cfg = RenderConfig(width=48, height=32, max_depth=6, seed=7)
    a = _render_engine("wavefront_fused", make(), cfg, rows=2, frames=2,
                       segment=3)
    b = _render_engine("sharded", make(), cfg, rows=2, frames=2,
                       segmented="1")          # 8-device mesh
    np.testing.assert_array_equal(a, b)
    c = _render_engine("sharded", make(), cfg, rows=2, frames=2,
                       segmented="1", devices=jax.devices()[:2])
    np.testing.assert_array_equal(a, c)


def test_sharded_segmented_instanced_scene():
    """In-kernel TLAS/BLAS instancing under the segmented multi-chip
    path: memory stays ∝ unique meshes and the image bit-matches the
    single-chip segmented engine."""
    from parallelraytracing_tpu.core.mesh import load_ply

    def make():
        mesh = load_ply("/root/reference/assets/models/icosahedron.ply")
        s = Scene(preset=None)
        red = s.add_lambertian((0.9, 0.2, 0.2))
        s.add_mesh_instances(
            mesh, red, [((1, 1, 1), (0, 30 * i, 0), (i * 3.0 - 3.0, 1, 0))
                        for i in range(3)])
        g = s.add_lambertian((0.5, 0.5, 0.5))
        s.add_quad(30, 30, g, None)
        light = s.add_emissive((10, 10, 10))
        s.add_sphere(1.0, light, ((1, 1, 1), (0, 0, 0), (4, 8, 4)))
        return s

    cfg = RenderConfig(width=48, height=32, max_depth=4, seed=3,
                       jitter=False)
    from parallelraytracing_tpu import Film, create_renderer
    film = Film(cfg.width, cfg.height)
    r = create_renderer("sharded")
    r.rows = 2
    r.segmented = "1"
    r.init(film, make(), default_camera(cfg.width, cfg.height), cfg)
    assert r._tables.inst is not None
    assert int(np.asarray(r._scene_data.tri_valid).sum()) == 0
    for _ in range(2):
        r.progressive_render()
    a = np.asarray(film.hdr_average())
    b = _render_engine("wavefront_fused", make(), cfg, rows=2, frames=2,
                       segment=2)
    np.testing.assert_array_equal(a, b)
