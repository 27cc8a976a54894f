"""Row-gather width splitting.

TPU row gathers of an (E, W) table cost ~5 ns/row up to W = 8 but jump
superlinearly past one sublane tile (measured STANDALONE: W=16 →
22 ns/row, W=24 → 30 ns/row — examples/tpu_campaign_r4.log micro2), so
splitting a wide gather into ≤8-wide chunks is ~2x faster in isolation.

HOWEVER: applying this inside the real render graphs was a measured NET
REGRESSION (campaign F [bwd2]: diff-mode forward 731 → 775 ms,
value_and_grad 1727 → 1921 ms at 1080p) — inside a fused graph XLA
already handles the wide gather better than the standalone benchmark
suggests, and under autodiff every extra gather op transposes to an
extra scatter-add (~60 ns/row for rows). The call sites were reverted;
this helper and its numbers stay as the record of the experiment. Use
only for primal-only standalone fetches, measured case by case."""

from __future__ import annotations

import jax.numpy as jnp

_W = 8  # one f32 sublane tile


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for a 2-D (E, W) table, split into ≤8-wide chunks."""
    w = table.shape[1]
    if w <= _W:
        return table[idx]
    return jnp.concatenate(
        [table[:, k:k + _W][idx] for k in range(0, w, _W)], axis=1)
