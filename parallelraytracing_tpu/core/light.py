"""Explicit lights.

The reference keeps an intentionally empty Light placeholder
(/root/reference/src/core/light.{h,cpp}) — explicit lights are modeled as
emissive materials instead (SURVEY.md §2 row 13).  This module mirrors
that design decision and provides the convenience constructors a light API
would otherwise offer, each returning an emissive-material primitive.

Next-event estimation (sampling these lights directly) is the natural
follow-on once importance sampling lands; the registry below records every
light added through this API so a future NEE integrator can enumerate
them.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

from parallelraytracing_tpu.core.scene import Scene


@dataclasses.dataclass(frozen=True)
class LightRecord:
    kind: str            # "sphere" | "quad"
    emission: Tuple[float, float, float]
    params: tuple        # kind-specific geometry


class LightList:
    """Registry of emissive primitives added through the light helpers."""

    def __init__(self) -> None:
        self._lights: List[LightRecord] = []

    def add_sphere_light(self, scene: Scene, center, radius: float,
                         emission) -> int:
        mat = scene.add_emissive(emission)
        scene.add_sphere(radius, mat, ((1, 1, 1), (0, 0, 0), tuple(center)))
        self._lights.append(LightRecord("sphere", tuple(emission),
                                        (tuple(center), radius)))
        return mat

    def add_quad_light(self, scene: Scene, width: float, height: float,
                       emission, transform=None) -> int:
        mat = scene.add_emissive(emission)
        scene.add_quad(width, height, mat, transform)
        self._lights.append(LightRecord("quad", tuple(emission),
                                        (width, height)))
        return mat

    def __len__(self) -> int:
        return len(self._lights)

    def __iter__(self):
        return iter(self._lights)
