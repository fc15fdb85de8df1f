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
