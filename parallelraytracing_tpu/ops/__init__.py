from parallelraytracing_tpu.ops.rays import generate_camera_rays
from parallelraytracing_tpu.ops.intersect import intersect_scene, HitRecord
from parallelraytracing_tpu.ops.materials import scatter, emitted

__all__ = ["generate_camera_rays", "intersect_scene", "HitRecord",
           "scatter", "emitted"]
