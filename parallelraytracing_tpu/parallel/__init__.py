from parallelraytracing_tpu.parallel.sharding import (
    make_render_mesh, render_frame_sharded)

__all__ = ["make_render_mesh", "render_frame_sharded"]
