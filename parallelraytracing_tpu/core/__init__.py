from parallelraytracing_tpu.core.camera import Camera
from parallelraytracing_tpu.core.film import Film
from parallelraytracing_tpu.core.scene import Scene, SceneData, ScenePreset

__all__ = ["Camera", "Film", "Scene", "SceneData", "ScenePreset"]
