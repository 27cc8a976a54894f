"""ACES filmic tonemap (Narkowicz approximation) —
progressive_rendering.glsl:19-26."""

from __future__ import annotations

import jax.numpy as jnp


def aces_film(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)
