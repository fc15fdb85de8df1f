"""Edge-aware path-tracing denoiser (À-Trous wavelet, SVGF-style weights).

A production subsystem NEITHER codebase has: the reference displays the
raw Monte-Carlo accumulation (film.cu display path); real-time path
tracers pair the tracer with a guided spatial filter.  Design follows
Dammertz et al. 2010 "Edge-Avoiding À-Trous Wavelet Transform" with the
SVGF-style guide weights (normal^sigma_n, depth, albedo-as-luminance
proxy), adapted to XLA:

- the guides (first-hit normal / albedo / depth) come from ONE extra
  deterministic depth-0 visibility pass over center rays
  (ops/intersect.intersect_scene) — jitter-free so the guides are
  noise-free, and scene-size-bounded exactly like any other jnp bounce;
- each À-Trous iteration is a 5x5 sparse-tap convolution with
  data-dependent weights.  XLA fuses the 25 shifted-multiply-adds into
  elementwise code; there is no dynamic control flow, so the whole
  filter jits to one program (static iteration count doubles the tap
  spacing per level — the classic wavelet cascade).

The filter runs on the HDR mean (film.hdr_average), so it composes with
any display transform downstream; `--denoise N` on the CLI applies N
iterations before the PNG encode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parallelraytracing_tpu.config import RenderConfig

#: 1D B3-spline kernel of the à-trous wavelet (outer product -> 5x5).
_H = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


@partial(jax.jit, static_argnames=("cfg",))
def aux_buffers(scene, cam_params, cfg: RenderConfig):
    """Noise-free guide buffers from one center-ray visibility pass.

    Returns (normal (H,W,3) unit or 0 on miss, albedo (H,W,3) — the
    surface albedo incl. textures, sky color on miss, depth (H,W) hit
    distance, +inf on miss)."""
    from parallelraytracing_tpu.ops.intersect import intersect_scene
    from parallelraytracing_tpu.ops.materials import surface_albedo
    from parallelraytracing_tpu.ops.rays import generate_camera_rays

    h, w = cfg.height, cfg.width
    o, d = generate_camera_rays(cam_params, w, h, None, jitter=False,
                                lens=None)
    hit = intersect_scene(scene, o, d, cfg.t_min, cfg.t_max,
                          cfg.intersect_chunk)
    alb = surface_albedo(scene, hit)
    from parallelraytracing_tpu.ops.sky import sky_radiance
    alb = jnp.where(hit.hit[:, None], alb, sky_radiance(scene, d))
    return (hit.normal.reshape(h, w, 3),
            alb.reshape(h, w, 3),
            hit.t.reshape(h, w))


def _shift(img, dy: int, dx: int):
    """Shift with edge clamp (SAME-size), any trailing channel dims."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def _luma(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def _local_std(lum):
    """Per-pixel luminance std over a 3x3 box — the cheap stand-in for
    SVGF's tracked variance, recomputed each cascade level so the
    luminance edge-stopper ADAPTS: noisy regions mix freely, converged
    regions keep their lighting edges."""
    s1 = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            t = _shift(lum, dy, dx)
            s1 = s1 + t
            s2 = s2 + t * t
    m = s1 / 9.0
    return jnp.sqrt(jnp.maximum(s2 / 9.0 - m * m, 0.0))


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(rad, normal, albedo, depth, iterations: int = 4,
                   sigma_n: float = 64.0, sigma_d: float = 1.0,
                   sigma_l: float = 4.0):
    """Edge-avoiding à-trous filter of an (H,W,3) HDR radiance image.

    Weights: w = h(tap) * dot(n, n')^sigma_n * exp(-|z-z'|/(sigma_d*|z|))
    * exp(-|luma-luma'| / (sigma_l * local_std + eps)); sky pixels (no
    normal) only mix with sky.  The luminance sigma is scaled by the
    LOCAL NOISE LEVEL (SVGF's variance-guided weight, estimated as a 3x3
    luminance std): a 4-frame accumulation smooths aggressively while a
    converged image keeps its lighting edges.  Albedo is DIVIDED OUT
    before filtering and re-applied after (demodulation), so
    texture/albedo detail survives aggressive smoothing of the
    irradiance — the SVGF trick."""
    eps = 1e-4
    demod = rad / (albedo + eps)
    miss = ~jnp.isfinite(depth)
    zsafe = jnp.where(miss, 0.0, depth)

    out = demod
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2], out.dtype)
        lum0 = _luma(out)
        inv_sl = 1.0 / (sigma_l * _local_std(lum0) + eps)
        for iy, hy in enumerate(_H):
            for ix, hx in enumerate(_H):
                dy, dx = (iy - 2) * step, (ix - 2) * step
                h_t = hy * hx
                n_t = _shift(normal, dy, dx)
                z_t = _shift(zsafe, dy, dx)
                m_t = _shift(miss, dy, dx)
                c_t = _shift(out, dy, dx)
                l_t = _luma(c_t)
                w_n = jnp.maximum(jnp.sum(normal * n_t, axis=-1),
                                  0.0) ** sigma_n
                w_n = jnp.where(miss & m_t, 1.0,
                                jnp.where(miss ^ m_t, 0.0, w_n))
                w_z = jnp.exp(-jnp.abs(zsafe - z_t)
                              / (sigma_d * jnp.abs(zsafe) + eps))
                w_z = jnp.where(miss & m_t, 1.0, w_z)
                w_l = jnp.exp(-jnp.abs(lum0 - l_t) * inv_sl)
                wgt = h_t * w_n * w_z * w_l
                acc = acc + c_t * wgt[..., None]
                wsum = wsum + wgt
        out = acc / jnp.maximum(wsum, eps)[..., None]
    return out * (albedo + eps)


def denoise_film(film, scene, cam_params, cfg: RenderConfig,
                 iterations: int = 4):
    """(H,W,3) denoised HDR mean of the film's current accumulation."""
    rad = film.hdr_average().reshape(cfg.height, cfg.width, 3)
    normal, albedo, depth = aux_buffers(scene, cam_params, cfg)
    return atrous_denoise(rad, normal, albedo, depth, iterations)


def save_denoised_png(path, film, scene, cam_params, cfg: RenderConfig,
                      iterations: int = 4, exposure: float = 1.0,
                      gamma: float = 2.2) -> None:
    """Denoise the film and write a PNG through the SAME display
    transform as Film.save_png (Reinhard + gamma + ToByte,
    film.h:63-75)."""
    import numpy as np

    import jax.numpy as jnp
    hdr = denoise_film(film, scene, cam_params, cfg, iterations)
    x = hdr * exposure
    x = x / (1.0 + x)
    x = jnp.power(jnp.maximum(x, 0.0), 1.0 / gamma)
    rgb = (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    img = np.asarray(jnp.concatenate([rgb, alpha], axis=-1))
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
