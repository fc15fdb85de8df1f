// Headless-build shim for the reference's <curand_kernel.h> include
// (core/math.h:5, core/tagged_pointer.h:8).  On the host path
// (__CUDA_ARCH__ undefined) Random() takes std::rand (math.h:10-17) and
// only the curandState* TYPE is needed for default-null parameters.
#pragma once
struct curandState {};
