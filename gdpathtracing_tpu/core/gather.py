"""Row-gather width splitting.

TPU row gathers of an (E, W) table cost ~5 ns/row up to W = 8 but jump
superlinearly past one sublane tile (measured: W=16 → 22 ns/row, W=24 →
30 ns/row — examples/tpu_campaign_r4.log micro2). Splitting a wide gather
into ≤8-wide column chunks is ~2x faster for the same data and is what
every packed-row fetch in the hot paths should use. The column slices of
the (small, E-sized) table are traced once and fuse away."""

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
