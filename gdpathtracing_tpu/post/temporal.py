"""Temporal reprojection: history blending for a moving camera.

Functional analog of reference TemporalReprojection (host
src/path_tracing/post_processing/temporal_reprojection.cpp:53-68; kernel
temporal_reprojection.glsl:32-71): reconstruct NDC from the reversed-Z
non-linear depth, reproject through ``prev_vp @ inv(vp)``, accept history
when in-bounds and the stored depth matches within a threshold, blend, ACES.

Deviations (quirks fixed, not copied): the blend factor is an actual
parameter (the reference uploads one but hard-codes 0.75 in the kernel,
temporal_reprojection.glsl:64), and the ping-pong buffer pair collapses into
one history array (pure-functional state makes the parity dance of
glsl:46,60,66 unnecessary).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp



class TemporalState(NamedTuple):
    history: jnp.ndarray      # (H, W, 3) f32 blended radiance history
    prev_depth: jnp.ndarray   # (H, W) f32 reversed-Z depth of last frame
    prev_vp: jnp.ndarray      # (4, 4)
    frame_count: jnp.ndarray  # () i32


def temporal_init(width: int, height: int) -> TemporalState:
    return TemporalState(
        history=jnp.zeros((height, width, 3), dtype=jnp.float32),
        prev_depth=jnp.zeros((height, width), dtype=jnp.float32),
        prev_vp=jnp.eye(4, dtype=jnp.float32),
        frame_count=jnp.int32(0),
    )


def nonlinear_depth(linear_depth: jnp.ndarray, near: float,
                    far: float) -> jnp.ndarray:
    """Reversed-Z non-linear mapping written by the main pass
    (main.glsl:432)."""
    return far / (far - near) * (1.0 - near / linear_depth)


def temporal_update(state: TemporalState, radiance: jnp.ndarray,
                    depth_nl: jnp.ndarray, vp: jnp.ndarray,
                    blend: float = 0.75, depth_eps: float = 0.1):
    """Returns (tonemapped (H,W,3), new state). `depth_nl` is the reversed-Z
    depth of the current frame; `vp` the current view-projection."""
    h, w = radiance.shape[:2]
    # deltaMatrix = previous_vp * inverse(vp) (temporal_reprojection.cpp:59-63)
    reproj = state.prev_vp @ jnp.linalg.inv(vp)

    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * -2.0 + 1.0
    ndc_x = jnp.broadcast_to(xs[None, :], (h, w))
    ndc_y = jnp.broadcast_to(ys[:, None], (h, w))
    # prevClip = reproj @ (x, y, depth, 1)    (glsl:50)
    px = reproj[0, 0] * ndc_x + reproj[0, 1] * ndc_y + reproj[0, 2] * depth_nl + reproj[0, 3]
    py = reproj[1, 0] * ndc_x + reproj[1, 1] * ndc_y + reproj[1, 2] * depth_nl + reproj[1, 3]
    pz = reproj[2, 0] * ndc_x + reproj[2, 1] * ndc_y + reproj[2, 2] * depth_nl + reproj[2, 3]
    pw = reproj[3, 0] * ndc_x + reproj[3, 1] * ndc_y + reproj[3, 2] * depth_nl + reproj[3, 3]
    safe_w = jnp.where(jnp.abs(pw) < 1e-8, 1e-8, pw)
    px, py, pz = px / safe_w, py / safe_w, pz / safe_w

    # prev pixel (nearest fetch, glsl:53-57)
    u = (px + 1.0) * 0.5
    v = (1.0 - py) * 0.5
    ix = jnp.floor(u * w).astype(jnp.int32)
    iy = jnp.floor(v * h).astype(jnp.int32)
    in_bounds = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    hist_color = state.history[iyc, ixc]
    hist_depth = state.prev_depth[iyc, ixc]
    # Depth-consistency test (glsl:59).
    accept = in_bounds & (jnp.abs(hist_depth - pz) < depth_eps) & \
        (state.frame_count > 0)

    reprojected = jnp.where(accept[..., None], hist_color, radiance)
    blended = radiance + (reprojected - radiance) * blend  # mix(cur, hist, b)

    new_state = TemporalState(
        history=blended,
        prev_depth=depth_nl,
        prev_vp=vp,
        frame_count=state.frame_count + 1,
    )
    return blended, new_state  # linear; display transform is the caller's
