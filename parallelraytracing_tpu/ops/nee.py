"""Next-event estimation (direct light sampling).

A genuine extension over the reference (its roadmap stops at "importance
sampling" as future work, wavefront.md:97-105; lights are only emissive
primitives found by random walks): at every Lambertian vertex, sample one
emissive primitive directly, cast a shadow ray, and add the direct
contribution analytically; emission is then skipped at the NEXT vertex if
it was reached by a diffuse bounce (standard unbiased NEE split — no
double counting, specular chains still pick up emission through the BSDF
ray).

Light sampling:
- sphere lights: uniform solid-angle cone sampling toward the sphere
  (pdf = 1 / (2 pi (1 - cos_theta_max))); points inside a light fall back
  to zero contribution.
- quad lights: uniform area sampling, converted to solid-angle pdf
  (dist^2 / (|cos_l| * area)).

Visibility is exact: the shadow ray runs the engine's closest-hit and the
sample counts only when the first hit IS the sampled light (no epsilon
games with t_max).  Opt-in via RenderConfig.nee.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parallelraytracing_tpu.core.scene import (
    KIND_QUAD, KIND_SPHERE, MAT_EMISSIVE, SceneData)

TWO_PI = 2.0 * np.pi


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LightsData:
    """Flat table of samplable emissive primitives (spheres + quads)."""

    kind: jax.Array    # (Nl,) i32 KIND_*
    idx: jax.Array     # (Nl,) i32 index within its kind (identity check)
    center: jax.Array  # (Nl,3)
    radius: jax.Array  # (Nl,)  spheres only
    u: jax.Array       # (Nl,3) quads only (half-extent edge)
    v: jax.Array       # (Nl,3)
    normal: jax.Array  # (Nl,3) quads only (unit)
    emit: jax.Array    # (Nl,3)

    @property
    def count(self) -> int:
        return int(self.kind.shape[0])


def extract_lights(scene: SceneData) -> Optional[LightsData]:
    """Host-side enumeration of emissive spheres/quads (the LightList
    registry's device form).  Returns None when the scene has none."""
    mt = np.asarray(scene.mat_type)
    rows = []
    sv = np.asarray(scene.sph_valid)
    sm = np.asarray(scene.sph_mat)
    for i in np.nonzero(sv & (mt[sm] == MAT_EMISSIVE))[0]:
        rows.append((KIND_SPHERE, int(i),
                     np.asarray(scene.sph_center)[i],
                     float(np.asarray(scene.sph_radius)[i]),
                     np.zeros(3), np.zeros(3), np.zeros(3),
                     np.asarray(scene.mat_emit)[sm[i]]))
    qv = np.asarray(scene.quad_valid)
    qm = np.asarray(scene.quad_mat)
    for i in np.nonzero(qv & (mt[qm] == MAT_EMISSIVE))[0]:
        rows.append((KIND_QUAD, int(i),
                     np.asarray(scene.quad_center)[i], 0.0,
                     np.asarray(scene.quad_u)[i],
                     np.asarray(scene.quad_v)[i],
                     np.asarray(scene.quad_normal)[i],
                     np.asarray(scene.mat_emit)[qm[i]]))
    if not rows:
        return None
    f = lambda k: jnp.asarray(np.asarray([r[k] for r in rows]), jnp.float32)
    return LightsData(
        kind=jnp.asarray([r[0] for r in rows], jnp.int32),
        idx=jnp.asarray([r[1] for r in rows], jnp.int32),
        center=f(2), radius=f(3), u=f(4), v=f(5), normal=f(6), emit=f(7))


def sample_light(lights: LightsData, p: jax.Array, u3: jax.Array
                 ) -> Tuple[jax.Array, ...]:
    """Sample one light per shading point.

    p: (R,3) surface points; u3: (R,3) uniforms.
    Returns (wi (R,3) unit, pdf_sa (R,), valid (R,), lkind (R,),
    lidx (R,), emit (R,3)) — pdf is per-steradian and already includes
    the uniform 1/Nl light choice."""
    nl = lights.count
    li = jnp.clip((u3[:, 0] * nl).astype(jnp.int32), 0, nl - 1)
    kind = lights.kind[li]
    c = lights.center[li]
    r = lights.radius[li]
    lu = lights.u[li]
    lv = lights.v[li]
    ln = lights.normal[li]
    emit = lights.emit[li]

    u1 = u3[:, 1]
    u2 = u3[:, 2]

    # ---- sphere: cone sampling toward the sphere
    to_c = c - p
    dc2 = jnp.sum(to_c * to_c, axis=1)
    dc = jnp.sqrt(jnp.maximum(dc2, 1e-20))
    axis = to_c / dc[:, None]
    sin2_max = jnp.clip(r * r / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u2
    # orthonormal frame around axis
    h = jnp.where(jnp.abs(axis[:, 0:1]) > 0.9,
                  jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), axis.shape),
                  jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), axis.shape))
    t1 = jnp.cross(axis, h)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
    t2 = jnp.cross(axis, t1)
    wi_s = (axis * cos_t[:, None]
            + (t1 * jnp.cos(phi)[:, None] + t2 * jnp.sin(phi)[:, None])
            * sin_t[:, None])
    pdf_s = 1.0 / jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-12)
    s_valid = dc2 > r * r  # outside the light

    # ---- quad: area sampling -> solid-angle pdf
    q = c + (2.0 * u1 - 1.0)[:, None] * lu + (2.0 * u2 - 1.0)[:, None] * lv
    dq = q - p
    dist2 = jnp.sum(dq * dq, axis=1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    wi_q = dq / dist[:, None]
    area = 4.0 * jnp.linalg.norm(jnp.cross(lu, lv), axis=1)
    cos_l = jnp.abs(jnp.sum(wi_q * ln, axis=1))
    pdf_q = dist2 / jnp.maximum(cos_l * area, 1e-12)
    q_valid = (cos_l > 1e-6) & (dist2 > 1e-12)

    is_sph = kind == KIND_SPHERE
    wi = jnp.where(is_sph[:, None], wi_s, wi_q)
    pdf = jnp.where(is_sph, pdf_s, pdf_q) / nl  # uniform light choice
    valid = jnp.where(is_sph, s_valid, q_valid)
    return wi, pdf, valid, kind, lights.idx[li], emit
