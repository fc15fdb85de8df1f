// Headless-build shim for the reference's <cuda_runtime.h> include
// (core/core.h:27, core/film.h:7).  The cross-validation harness compiles
// the reference's CPU path with plain g++; no CUDA runtime symbols are
// reachable from that path (film.cu is replaced by film_cpu.cpp, which
// defines only the host-side Film methods), so an empty header suffices.
#pragma once
