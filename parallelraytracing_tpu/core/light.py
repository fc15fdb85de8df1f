"""Explicit lights.

The reference keeps an intentionally empty Light placeholder
(/root/reference/src/core/light.{h,cpp}) — explicit lights are modeled as
emissive materials instead (SURVEY.md §2 row 13).  This module keeps that
design and provides the convenience constructors a light API would
otherwise offer.

Light ENUMERATION for next-event estimation does not need a registry:
`ops/nee.extract_lights(scene.build())` finds every samplable emissive
primitive in the compiled scene — including ones added without these
helpers — and `RenderConfig.nee=True` turns on direct light sampling in
the megakernel/bvh engines.
"""

from __future__ import annotations

from parallelraytracing_tpu.core.scene import Scene


def add_sphere_light(scene: Scene, center, radius: float, emission) -> int:
    """Emissive sphere; returns the material id."""
    mat = scene.add_emissive(emission)
    scene.add_sphere(radius, mat, ((1, 1, 1), (0, 0, 0), tuple(center)))
    return mat


def add_quad_light(scene: Scene, width: float, height: float, emission,
                   transform=None) -> int:
    """Emissive quad; returns the material id."""
    mat = scene.add_emissive(emission)
    scene.add_quad(width, height, mat, transform)
    return mat
