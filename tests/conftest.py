"""Test config: force CPU jax with 8 virtual devices so multi-chip sharding
logic is testable without a TPU pod (SURVEY.md §4).

NOTE: the JAX_PLATFORMS env var can be overridden by a TPU plugin's
sitecustomize, so the platform must be forced through
jax.config BEFORE any backend initialization."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
