"""Progressive accumulation: unbounded averaging while the camera is still.

Functional analog of reference ProgressiveRendering (host reset logic
src/path_tracing/post_processing/progressive_rendering.cpp:53-60; kernel
progressive_rendering.glsl:29-46). The accumulator + frame count are an
explicit state pytree — which is also the checkpoint/resume story
(SURVEY.md §5): serialize the state, keep accumulating later.

One deliberate improvement: the reference accumulates the quantized rgba8
screen texture (progressive_rendering.glsl:33); we accumulate full-precision
radiance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp



class ProgressiveState(NamedTuple):
    accum: jnp.ndarray          # (H, W, 3) f32 radiance sum
    frame_count: jnp.ndarray    # () i32
    prev_transform: jnp.ndarray  # (3, 4) camera transform of last frame


def progressive_init(width: int, height: int) -> ProgressiveState:
    return ProgressiveState(
        accum=jnp.zeros((height, width, 3), dtype=jnp.float32),
        frame_count=jnp.int32(0),
        prev_transform=jnp.full((3, 4), jnp.inf, dtype=jnp.float32),
    )


def progressive_update(state: ProgressiveState, radiance: jnp.ndarray,
                       cam_transform: jnp.ndarray, eps: float = 1e-5):
    """Returns (LINEAR averaged radiance (H,W,3), new state). Camera motion
    resets the accumulator (the is_equal_approx check at
    progressive_rendering.cpp:53-60). The display transform
    (exposure/bloom/tonemap) is applied by the caller — post/display.py."""
    moved = jnp.any(jnp.abs(state.prev_transform - cam_transform) > eps)
    count = jnp.where(moved, 1, state.frame_count + 1).astype(jnp.int32)
    accum = jnp.where(moved, radiance, state.accum + radiance)
    avg = accum / count.astype(jnp.float32)
    return avg, ProgressiveState(accum, count, cam_transform)
