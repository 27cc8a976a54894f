"""Fused Pallas TPU kernel: closest-hit over the expanded triangle list.

Same unit-triangle-space math as render/intersect.py:trace_unit — two
K=4 contractions + elementwise epilogue + argmin reduction — but fused into
one kernel so the (rays × tris) intermediates never leave VMEM. The pure-JAX
version streams ~10 (N, C) f32 temporaries through HBM per chunk; this
kernel's only HBM traffic is the ray blocks in and 5 per-ray scalars out:
the op is compute-bound on the VPU/MXU instead of bandwidth-bound.

Grid: (ray_blocks, tri_chunks), tri axis minor — each output block stays
resident in VMEM across the whole tri sweep (Pallas revisiting rule), so
the running closest-hit is a free in-VMEM accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdpathtracing_tpu.render.types import MISS_T, HitInfo, Ray
from gdpathtracing_tpu.scene.scene import Scene

BN = 256  # rays per block
BT = 256  # triangles per chunk
_WD_EPS = 1e-12
_MISS = 1e9  # python float: jnp constants would be captured by the kernel


def _kernel(o4_ref, d4_ref, mu_ref, mv_ref, mw_ref, t_ref, idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[i, :] = jnp.full((t_ref.shape[1],), _MISS, jnp.float32)
        idx_ref[i, :] = jnp.zeros((idx_ref.shape[1],), jnp.int32)

    o4 = o4_ref[...]  # (4, BN)
    d4 = d4_ref[...]
    mu = mu_ref[...]  # (4, BT)
    mv = mv_ref[...]
    mw = mw_ref[...]

    def mm(a, b):  # (4,BN)ᵀ·(4,BT) → (BN, BT)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    u_o, v_o, w_o = mm(o4, mu), mm(o4, mv), mm(o4, mw)
    u_d, v_d, w_d = mm(d4, mu), mm(d4, mv), mm(d4, mw)

    wd_ok = jnp.abs(w_d) > _WD_EPS
    inv_wd = jnp.where(wd_ok, w_d, 1.0)
    t = -w_o / inv_wd
    u = u_o + t * u_d
    v = v_o + t * v_d
    valid = wd_ok & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    t = jnp.where(valid, t, _MISS)

    tk = jnp.min(t, axis=1)                      # (BN,)
    k = jnp.argmin(t, axis=1).astype(jnp.int32)  # (BN,)

    cur = t_ref[i, :]
    better = tk < cur
    t_ref[i, :] = jnp.where(better, tk, cur)
    idx_ref[i, :] = jnp.where(better, j * BT + k, idx_ref[i, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_hit(o4t, d4t, mu, mv, mw, interpret=False):
    """o4t/d4t: (4, N); mu/mv/mw: (4, E). N % BN == 0, E % BT == 0.
    Returns (t, idx, u, v, front_i32) each (N,)."""
    n = o4t.shape[1]
    e = mu.shape[1]
    grid = (n // BN, e // BT)
    gr = grid[0]

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Full-array blocks (TPU blocks need sublane multiples of 8;
            # a (1, BN) row block is not lowerable). The whole output stays
            # VMEM-resident; each grid step writes its own row i.
            pl.BlockSpec((gr, BN), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gr, BN), jnp.float32),
            jax.ShapeDtypeStruct((gr, BN), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * 4 * n * e + 12 * n * e,
            bytes_accessed=(2 * 4 * n + 3 * 4 * e + 5 * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(o4t, d4t, mu, mv, mw)
    t, idx = (a.reshape(-1) for a in out)
    return t, idx


def trace_pallas(scene: Scene, ray: Ray, active=None,
                 interpret: bool = False) -> HitInfo:
    """HitInfo-producing wrapper (pads the wavefront to BN)."""
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ray.o.x), pad(ray.o.y), pad(ray.o.z),
                     pad(ray.o.x * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(ray.d.x), pad(ray.d.y), pad(ray.d.z),
                     pad(ray.d.x * 0)], axis=0)

    t, idx = _closest_hit(
        o4t, d4t, scene.isect_mu, scene.isect_mv, scene.isect_mw,
        interpret=interpret)
    t, idx = t[:n], idx[:n]

    # Recompute barycentrics / facing for the winning triangle only:
    # gather its 12 matrix floats and redo the 4-term dots per ray — far
    # cheaper than selecting them inside the (rays × tris) kernel sweep.
    mu_e = scene.isect_mu[:, idx]  # (4, N)
    mv_e = scene.isect_mv[:, idx]
    mw_e = scene.isect_mw[:, idx]

    def dot4(m, x, y, z, w):
        return m[0] * x + m[1] * y + m[2] * z + m[3] * w

    one = ray.o.x * 0.0 + 1.0
    zero = ray.o.x * 0.0
    u = dot4(mu_e, ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(mu_e, ray.d.x, ray.d.y, ray.d.z, zero)
    v = dot4(mv_e, ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(mv_e, ray.d.x, ray.d.y, ray.d.z, zero)
    w_d = dot4(mw_e, ray.d.x, ray.d.y, ray.d.z, zero)
    front = w_d < 0.0

    hit = t < MISS_T
    tri = jnp.where(hit, scene.isect_tri[idx], 0)
    inst = jnp.where(hit, scene.isect_inst[idx], 0)
    if active is not None:
        t = jnp.where(active, t, MISS_T)
    steps = (ray.o.x * 0.0).astype(jnp.int32) + scene.isect_mu.shape[1]
    return HitInfo(t=t, tri=tri, inst=inst,
                   u=jnp.clip(u, 0.0, 1.0), v=jnp.clip(v, 0.0, 1.0),
                   front=front, steps=steps)
