"""Edge-aware à-trous wavelet denoiser (reference wishlist "Denoiser",
README.md:40).

Dammertz-style: repeated 5×5 B3-spline cross-bilateral passes with
doubling hole size, weighted by color, normal, and depth differences from
the frame AOVs. Pure JAX, fully fused by XLA, differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_KERNEL_1D = jnp.asarray([1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16],
                         dtype=jnp.float32)
_OFFSETS = (-2, -1, 0, 1, 2)


def _shift2d(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge clamping (any ndim ≥ 2, spatial dims first)."""
    if dy:
        a = jnp.roll(a, dy, axis=0)
        if dy > 0:
            a = a.at[:dy].set(a[dy])
        else:
            a = a.at[dy:].set(a[dy - 1])
    if dx:
        a = jnp.roll(a, dx, axis=1)
        if dx > 0:
            a = a.at[:, :dx].set(a[:, dx:dx + 1])
        else:
            a = a.at[:, dx:].set(a[:, dx - 1:dx])
    return a


def atrous_denoise(color: jnp.ndarray, normal: jnp.ndarray,
                   depth: jnp.ndarray, iterations: int = 3,
                   sigma_color: float = 0.5, sigma_normal: float = 0.25,
                   sigma_depth: float = 0.5) -> jnp.ndarray:
    """(H, W, 3) linear color + (H, W, 3) normals + (H, W) depth →
    denoised color."""
    out = color
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2], out.dtype)
        for iy, oy in enumerate(_OFFSETS):
            for ix, ox in enumerate(_OFFSETS):
                w_k = float(_KERNEL_1D[iy] * _KERNEL_1D[ix])
                dy, dx = oy * step, ox * step
                c = _shift2d(out, dy, dx)
                n = _shift2d(normal, dy, dx)
                d = _shift2d(depth, dy, dx)
                dc = jnp.sum((c - out) ** 2, axis=-1)
                w_c = jnp.exp(-dc / (sigma_color ** 2))
                dn = jnp.sum((n - normal) ** 2, axis=-1)
                w_n = jnp.exp(-dn / (sigma_normal ** 2))
                dd = (d - depth) ** 2
                w_d = jnp.exp(-dd / (sigma_depth ** 2))
                w = w_k * w_c * w_n * w_d
                acc = acc + c * w[..., None]
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)[..., None]
    return out
