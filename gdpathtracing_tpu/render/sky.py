"""Analytic gradient sky — main.glsl:189-192."""

from __future__ import annotations

from gdpathtracing_tpu.config import RenderConfig
from gdpathtracing_tpu.core.vec import Vec3, lerp


def sample_sky(direction: Vec3, config: RenderConfig) -> Vec3:
    t = 0.5 * (direction.y + 1.0)
    return lerp(Vec3(*config.sky_horizon), Vec3(*config.sky_zenith), t)
