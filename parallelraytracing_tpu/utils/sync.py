"""Device synchronization that actually waits.

On some TPU plugin backends `jax.block_until_ready` returns before execution
finishes (buffer metadata is available early), which silently breaks
wall-clock measurement.  `device_sync` forces completion by materializing
a tiny reduction on the host — the universally-correct fence."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def device_sync(*arrays) -> float:
    """Block until every given array's computation has completed.
    Returns the (meaningless) reduced value so callers can ignore it."""
    acc = 0.0
    for a in arrays:
        acc += float(np.asarray(jnp.sum(a if a.dtype != bool else a.astype(jnp.int32))))
    return acc
