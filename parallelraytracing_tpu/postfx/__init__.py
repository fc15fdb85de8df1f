from parallelraytracing_tpu.postfx.denoise import (atrous_denoise,
                                                   aux_buffers,
                                                   denoise_film,
                                                   save_denoised_png)

__all__ = ["atrous_denoise", "aux_buffers", "denoise_film",
           "save_denoised_png"]
