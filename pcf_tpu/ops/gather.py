"""Batched point gathers.

TPU-native replacement for the reference's index_points (layer_utils.py:13-30)
and the gather stages of the pcf_cuda kernels. On TPU, XLA lowers jnp.take to
a native gather; out-of-range indices are clamped, which makes the padded rows
of a static-shape packed batch safe to gather through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of `points` by integer index.

    Accepts the reference layout (reference: layer_utils.py:13-30):
      points: [B, N, C], idx: [B, S] or [B, S, K] -> [B, S, C] / [B, S, K, C]
    and the packed 2-D layout used internally:
      points: [N, C],    idx: [S] / [S, K]        -> [S, C] / [S, K, C]
    """
    if points.ndim == 2:
        return jnp.take(points, idx, axis=0, mode="clip")
    # Batched: map the gather over the leading batch dim.
    return jax.vmap(lambda p, i: jnp.take(p, i, axis=0, mode="clip"))(points, idx)
