import os

import jax.numpy as jnp
import numpy as np
import pytest

from parallelraytracing_tpu.core.film import Film
from parallelraytracing_tpu.utils.png import read_png, write_png


def test_accumulation_weight_normalizes():
    film = Film(4, 2)
    film.add_sample_buffer(jnp.full((2, 4, 3), 2.0))
    film.add_sample_buffer(jnp.full((2, 4, 3), 4.0))
    np.testing.assert_allclose(np.asarray(film.hdr_average()), 3.0)
    assert film.sample_count == 2


def test_weighted_samples():
    film = Film(2, 2)
    film.add_sample_buffer(jnp.full((2, 2, 3), 1.0), weight=1.0)
    film.add_sample_buffer(jnp.full((2, 2, 3), 10.0), weight=3.0)
    np.testing.assert_allclose(np.asarray(film.hdr_average()), 31.0 / 4.0)


def test_clear_resets():
    film = Film(2, 2)
    film.add_sample_buffer(jnp.ones((2, 2, 3)))
    film.clear()
    np.testing.assert_allclose(np.asarray(film.accum), 0.0)
    assert film.sample_count == 0
    disp = film.display_numpy()
    assert disp.shape == (2, 2, 4)
    np.testing.assert_array_equal(disp[..., :3], 0)
    np.testing.assert_array_equal(disp[..., 3], 255)


def test_tonemap_matches_reference_formula():
    # value v -> reinhard v/(1+v) -> gamma^(1/2.2) -> byte(v*255+0.5)
    film = Film(1, 1)
    film.add_sample_buffer(jnp.asarray([[[0.5, 1.0, 4.0]]]))
    disp = film.display_numpy()
    for c, v in enumerate([0.5, 1.0, 4.0]):
        x = v / (1.0 + v)
        x = x ** (1 / 2.2)
        assert disp[0, 0, c] == int(min(max(x, 0), 1) * 255.0 + 0.5)


def test_zero_weight_pixels_are_black():
    film = Film(2, 1)
    disp = film.display_numpy()
    np.testing.assert_array_equal(disp[..., :3], 0)


def test_checkpoint_roundtrip(tmp_path):
    film = Film(3, 2)
    film.add_sample_buffer(jnp.arange(18, dtype=jnp.float32).reshape(2, 3, 3))
    p = str(tmp_path / "ckpt.npz")
    film.save_checkpoint(p, frame_index=7)
    film2, frame = Film.load_checkpoint(p)
    assert frame == 7
    assert film2.sample_count == 1
    np.testing.assert_allclose(np.asarray(film2.accum), np.asarray(film.accum))


def test_png_roundtrip(tmp_path):
    img = (np.arange(4 * 5 * 4).reshape(4, 5, 4) * 13 % 256).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_film_layout_roundtrip_preserves_content():
    """Engine storage layouts (Film.set_layout): accumulation written in
    a permuted (slots >= H*W) order reads back canonically through every
    output path, and installing/removing a layout CONVERTS the content
    (checkpoint resume + viewer engine switches keep progressive state)."""
    import jax.numpy as jnp
    import numpy as np

    from parallelraytracing_tpu.core.film import Film

    h, w, slots = 4, 6, 32  # 24 pixels stored in 32 padded slots
    rng = np.random.default_rng(0)
    perm = rng.permutation(slots)[:h * w]  # slot of pixel p = perm[p]
    inv = np.asarray(perm, np.int32)

    # canonical accumulation first, then install the layout: content must
    # survive the conversion
    film = Film(w, h)
    rgb0 = rng.uniform(0.1, 2.0, (h * w, 3)).astype(np.float32)
    film.add_sample_buffer(jnp.asarray(rgb0))
    before = np.asarray(film.hdr_average())
    film.set_layout((inv, slots))
    np.testing.assert_allclose(np.asarray(film.hdr_average()), before,
                               rtol=1e-6)

    # accumulate IN layout order: slot perm[p] carries pixel p
    rgb1 = rng.uniform(0.1, 2.0, (h * w, 3)).astype(np.float32)
    buf = np.zeros((slots, 3), np.float32)
    buf[perm] = rgb1
    film.add_sample_buffer(jnp.asarray(buf))
    want = (rgb0 + rgb1).reshape(h, w, 3) / 2.0
    np.testing.assert_allclose(np.asarray(film.hdr_average()), want,
                               rtol=1e-6)
    assert film.sample_count == 2

    # display path goes through the same gather
    disp = np.asarray(film.to_display())
    assert disp.shape == (h, w, 4)

    # checkpoint is canonical; restoring into a plain film matches
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "ckpt.npz")
        film.save_checkpoint(p, frame_index=2)
        film2, fi = Film.load_checkpoint(p)
        assert fi == 2
        np.testing.assert_allclose(np.asarray(film2.hdr_average()), want,
                                   rtol=1e-6)

    # removing the layout converts back
    film.set_layout(None)
    assert film.accum.shape == (h, w, 3)
    np.testing.assert_allclose(np.asarray(film.hdr_average()), want,
                               rtol=1e-6)


def test_save_pfm_roundtrip(tmp_path):
    """Linear HDR output (--hdr-out): PF header, bottom-to-top rows,
    little-endian floats equal to hdr_average exactly."""
    import numpy as np

    from parallelraytracing_tpu import Film

    film = Film(8, 4)
    rgb = np.arange(8 * 4 * 3, dtype=np.float32).reshape(32, 3)
    film.add_sample_buffer(rgb, weight=2.0)
    p = tmp_path / "out.pfm"
    film.save_pfm(str(p))
    with open(p, "rb") as f:
        assert f.readline() == b"PF\n"
        w, h = map(int, f.readline().split())
        assert (w, h) == (8, 4)
        assert float(f.readline()) == -1.0
        data = np.frombuffer(f.read(), "<f4").reshape(h, w, 3)[::-1]
    np.testing.assert_array_equal(data,
                                  np.asarray(film.hdr_average()))
