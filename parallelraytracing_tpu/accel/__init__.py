from parallelraytracing_tpu.accel.lbvh import BVHData, build_bvh
from parallelraytracing_tpu.accel.traverse import bvh_intersect_scene

__all__ = ["BVHData", "build_bvh", "bvh_intersect_scene"]
