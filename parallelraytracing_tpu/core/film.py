"""Device-resident accumulating film.

Replaces the reference Film (/root/reference/src/core/film.{h,cu}): linear
RGB accumulation (f32 per channel), per-pixel weights, and an RGBA8 display
conversion doing weight-normalize -> Reinhard x/(1+x) -> gamma 1/2.2 -> u8
with +0.5 rounding (film.cu:101-132, film.h:63-75).

Like the reference's GPU film, samples never round-trip to the host: the
accumulate and tonemap steps are tiny jits over HBM-resident arrays
(AddSampleBufferGPU / UpdateDisplayGPU analogues, film.cu:79-132); only the
final display buffer is fetched.  Buffers are donated so accumulation is
in-place.

Improvement over the reference: true render checkpointing — the
accumulation state (accum + weights + sample count + frame index) can be
saved and restored (the reference's only persistent state is intentionally
discarded on camera movement, main.cpp:506-511)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0, 1))
def _accumulate(accum, weights, rgb, weight):
    return accum + rgb * weight, weights + weight


@partial(jax.jit, static_argnames=())
def _to_display(accum, weights, exposure, inv_gamma):
    w = weights[..., None]
    safe = w > 0.0
    mean = jnp.where(safe, accum / jnp.where(safe, w, 1.0), 0.0)
    x = mean * exposure
    x = x / (1.0 + x)                     # Reinhard (film.h:63-69)
    x = jnp.power(jnp.maximum(x, 0.0), inv_gamma)
    rgb = jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5  # ToByte (film.h:71-75)
    rgb = rgb.astype(jnp.uint8)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


@jax.jit
def _hdr_average(accum, weights):
    w = weights[..., None]
    safe = w > 0.0
    return jnp.where(safe, accum / jnp.where(safe, w, 1.0), 0.0)


class Film:
    def __init__(self, width: int, height: int, dtype=jnp.float32):
        self.width = int(width)
        self.height = int(height)
        self._dtype = dtype
        #: optional storage layout: accum/weights live as (slots,) flat
        #: buffers in an engine-chosen pixel order (e.g. the sharded
        #: engine's padded Morton blocks, which keep the accumulation
        #: px-SHARDED across chips with zero per-frame gathers); inv maps
        #: pixel id -> storage slot and is applied only at display/read.
        self._layout_inv = None
        self._slots = 0
        self._alloc()

    def _alloc(self) -> None:
        if self._layout_inv is None:
            self.accum = jnp.zeros((self.height, self.width, 3), self._dtype)
            self.weights = jnp.zeros((self.height, self.width), self._dtype)
        else:
            self.accum = jnp.zeros((self._slots, 3), self._dtype)
            self.weights = jnp.zeros((self._slots,), self._dtype)
        self.sample_count = 0

    def set_layout(self, layout) -> None:
        """Install (inv, slots) — inv (H*W,) i32 pixel->slot — or None to
        restore the canonical (H,W) layout.  Accumulated content is
        CONVERTED, not dropped, so engine switches and checkpoint resume
        keep their progressive state."""
        if layout is None:
            if self._layout_inv is None:
                return
            self.accum = self._canonical(self.accum)
            self.weights = self._canonical(self.weights)
            self._layout_inv = None
            self._slots = 0
            return
        inv, slots = layout
        inv = jnp.asarray(inv, jnp.int32)
        slots = int(slots)
        assert inv.shape == (self.height * self.width,)
        assert slots >= self.height * self.width
        if self._layout_inv is not None:
            if slots == self._slots and bool(
                    jnp.array_equal(inv, self._layout_inv)):
                return
            acc = self._canonical(self.accum)
            w = self._canonical(self.weights)
        else:
            acc = self.accum
            w = self.weights
        self._layout_inv = inv
        self._slots = slots
        self.accum = jnp.zeros((slots, 3), self._dtype).at[inv].set(
            acc.reshape(-1, 3))
        self.weights = jnp.zeros((slots,), self._dtype).at[inv].set(
            w.reshape(-1))

    def _canonical(self, flat: jax.Array):
        """Gather a (slots, ...) storage buffer back to pixel order
        (H, W, ...) — the ONLY place the layout is undone."""
        img = jnp.take(flat, self._layout_inv, axis=0)
        return img.reshape((self.height, self.width) + flat.shape[1:])

    def resize(self, width: int, height: int) -> None:
        """Film::Resize (film.cu:11-23): reallocate buffers and reset."""
        self.width = int(width)
        self.height = int(height)
        self._layout_inv = None  # layouts are resolution-specific
        self._slots = 0
        self._alloc()

    # ------------------------------------------------------------------
    def clear(self) -> None:
        """Film::Clear (film.cu:25-35) — progressive reset on camera move."""
        self.accum = jnp.zeros_like(self.accum)
        self.weights = jnp.zeros_like(self.weights)
        self.sample_count = 0

    def add_sample(self, x: int, y: int, rgb, weight: float = 1.0) -> None:
        """Film::AddSample (film.cu:37-55): accumulate one sample into one
        pixel (bounds-checked like the reference)."""
        if not (0 <= x < self.width and 0 <= y < self.height):
            return
        rgb = jnp.asarray(rgb, self._dtype)
        if self._layout_inv is not None:
            slot = self._layout_inv[y * self.width + x]
            self.accum = self.accum.at[slot].add(rgb * weight)
            self.weights = self.weights.at[slot].add(weight)
            return
        self.accum = self.accum.at[y, x].add(rgb * weight)
        self.weights = self.weights.at[y, x].add(weight)

    def add_sample_buffer(self, rgb: jax.Array, weight: float = 1.0) -> None:
        """Film::AddSampleBuffer[GPU] (film.cu:57-99): accumulate one frame
        of per-pixel radiance. rgb: (H,W,3) or (H*W,3) — or (slots,3) in
        the film's storage layout when one is installed (the buffer then
        stays in the producing engine's sharding; no gather)."""
        if self._layout_inv is not None:
            rgb = rgb.reshape(self._slots, 3).astype(self._dtype)
        else:
            rgb = rgb.reshape(self.height, self.width, 3).astype(self._dtype)
        self.accum, self.weights = _accumulate(
            self.accum, self.weights, rgb, jnp.asarray(weight, self._dtype))
        self.sample_count += 1

    def add_sample_slots(self, slots: jax.Array, rgb: jax.Array,
                         weight: float = 1.0) -> None:
        """Accumulate a SUBSET of storage slots (the adaptive engine's
        variance-selected pixel budget): slots (B,) i32 indices into the
        installed storage layout (or canonical flat H*W order), rgb
        (B,3).  Per-pixel means stay exact because weights track each
        pixel's own sample count — the film never assumes uniform
        coverage (duplicate slots accumulate additively, .at[].add)."""
        rgb = rgb.astype(self._dtype)
        w = jnp.asarray(weight, self._dtype)
        if self._layout_inv is None:
            acc = self.accum.reshape(-1, 3).at[slots].add(rgb * w)
            wts = self.weights.reshape(-1).at[slots].add(w)
            self.accum = acc.reshape(self.height, self.width, 3)
            self.weights = wts.reshape(self.height, self.width)
        else:
            self.accum = self.accum.at[slots].add(rgb * w)
            self.weights = self.weights.at[slots].add(w)
        self.sample_count += 1

    # ------------------------------------------------------------------
    def to_display(self, exposure: float = 1.0, gamma: float = 2.2) -> jax.Array:
        """UpdateDisplay[GPU] -> (H,W,4) uint8 on device."""
        if self._layout_inv is not None:
            return _to_display(self._canonical(self.accum),
                               self._canonical(self.weights),
                               jnp.asarray(exposure, self._dtype),
                               jnp.asarray(1.0 / gamma, self._dtype))
        return _to_display(self.accum, self.weights,
                           jnp.asarray(exposure, self._dtype),
                           jnp.asarray(1.0 / gamma, self._dtype))

    def display_numpy(self, exposure: float = 1.0, gamma: float = 2.2) -> np.ndarray:
        return np.asarray(self.to_display(exposure, gamma))

    def hdr_average(self) -> jax.Array:
        """Weight-normalized linear HDR image (H,W,3) — the quantity RMSE
        fidelity gates compare."""
        if self._layout_inv is not None:
            return _hdr_average(self._canonical(self.accum),
                                self._canonical(self.weights))
        return _hdr_average(self.accum, self.weights)

    def save_png(self, path: str, exposure: float = 1.0, gamma: float = 2.2) -> None:
        img = self.display_numpy(exposure, gamma)
        try:
            from parallelraytracing_tpu import native
            if native.available():
                with open(path, "wb") as f:
                    f.write(native.encode_png(img))
                return
        except Exception:
            pass
        from parallelraytracing_tpu.utils.png import write_png
        write_png(path, img)

    def save_pfm(self, path: str) -> None:
        """Write the linear HDR average as a Portable Float Map (PF,
        little-endian) — lossless float output for compositing/grading
        pipelines; the reference can only show its tonemapped u8 buffer
        (film.cu:101-132).  PFM stores rows bottom-to-top."""
        img = np.asarray(self.hdr_average(), dtype=np.float32)
        with open(path, "wb") as f:
            f.write(b"PF\n")
            f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
            f.write(b"-1.0\n")  # negative scale = little-endian
            f.write(np.ascontiguousarray(img[::-1]).astype("<f4").tobytes())

    # ----------------------------------------------------------- checkpoint
    def save_checkpoint(self, path: str, frame_index: int = 0) -> None:
        # Checkpoints are CANONICAL (pixel-order) regardless of storage
        # layout, so any engine can resume any checkpoint.
        if self._layout_inv is not None:
            accum = np.asarray(self._canonical(self.accum))
            weights = np.asarray(self._canonical(self.weights))
        else:
            accum = np.asarray(self.accum)
            weights = np.asarray(self.weights)
        np.savez(path,
                 accum=accum,
                 weights=weights,
                 sample_count=self.sample_count,
                 frame_index=frame_index,
                 width=self.width, height=self.height)

    @classmethod
    def load_checkpoint(cls, path: str) -> Tuple["Film", int]:
        z = np.load(path)
        film = cls(int(z["width"]), int(z["height"]))
        film.accum = jnp.asarray(z["accum"])
        film.weights = jnp.asarray(z["weights"])
        film.sample_count = int(z["sample_count"])
        return film, int(z["frame_index"])
