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
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdpathtracing_tpu.render.types import MISS_T, HitInfo, Ray
from gdpathtracing_tpu.scene.scene import Scene

BN = 256  # rays per block
BT = 256  # triangles per chunk
_FORCE_INTERPRET = False  # test hook: run kernels in interpret mode on CPU
_WD_EPS = 1e-12
_MISS = 1e9  # python float: jnp constants would be captured by the kernel


def out_vma(*xs):
    """Union of the varying-manual-axes sets of the kernel inputs.

    Under ``shard_map(check_vma=True)`` a ``pallas_call`` must declare how
    its outputs vary over mesh axes; outputs vary over every axis any input
    varies over (the kernels are elementwise in the ray-block axis, and the
    replicated scene tables contribute the empty set). Outside shard_map
    every input's vma is the empty frozenset — a no-op."""
    vma = frozenset()
    for x in xs:
        try:
            vma = vma | jax.typeof(x).vma
        except (AttributeError, TypeError):
            pass
    return vma


def _kernel(chunk_ref, o4_ref, d4_ref, mu_ref, mv_ref, mw_ref,
            t_ref, idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[i, :] = jnp.full((t_ref.shape[1],), _MISS, jnp.float32)
        idx_ref[i, :] = jnp.zeros((idx_ref.shape[1],), jnp.int32)

    o4 = o4_ref[...]  # (4, BN)
    d4 = d4_ref[...]
    cur = t_ref[i, :]

    # Chunk culling: slab-test every ray in the block against this chunk's
    # AABB (~25 ops on (BN,) vs ~20 ops on (BN, BT) for the full sweep).
    # Chunks are Morton-compact, so most (ray-block × chunk) tiles skip.
    # Bounds come in as a scalar-prefetch arg (SMEM): 6 scalars per chunk.
    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    rdx = 1.0 / jnp.where(jnp.abs(dx) < 1e-30, 1e-30, dx)
    rdy = 1.0 / jnp.where(jnp.abs(dy) < 1e-30, 1e-30, dy)
    rdz = 1.0 / jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)
    base = j * 8
    tx1 = (chunk_ref[base + 0] - ox) * rdx
    tx2 = (chunk_ref[base + 3] - ox) * rdx
    ty1 = (chunk_ref[base + 1] - oy) * rdy
    ty2 = (chunk_ref[base + 4] - oy) * rdy
    tz1 = (chunk_ref[base + 2] - oz) * rdz
    tz2 = (chunk_ref[base + 5] - oz) * rdz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < cur)

    @pl.when(jnp.any(may_hit))
    def _():
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

        better = (tk < cur) & may_hit
        t_ref[i, :] = jnp.where(better, tk, cur)
        idx_ref[i, :] = jnp.where(better, j * BT + k, idx_ref[i, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_hit(o4t, d4t, chunk_bounds, mu, mv, mw, interpret=False):
    """o4t/d4t: (4, N); chunk_bounds: (8, E//BT); mu/mv/mw: (4, E).
    N % BN == 0, E % BT == 0. Returns (t, idx) each (N,)."""
    n = o4t.shape[1]
    e = mu.shape[1]
    grid = (n // BN, e // BT)
    gr = grid[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # chunk bounds → SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
            pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
            pl.BlockSpec((4, BT), lambda i, j, *_: (0, j)),
        ],
        out_specs=[
            # Full-array blocks (TPU blocks need sublane multiples of 8;
            # a (1, BN) row block is not lowerable). The whole output stays
            # VMEM-resident; each grid step writes its own row i.
            pl.BlockSpec((gr, BN), lambda i, j, *_: (0, 0))
            for _ in range(2)
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gr, BN), jnp.float32,
                                 vma=out_vma(o4t, d4t, mu)),
            jax.ShapeDtypeStruct((gr, BN), jnp.int32,
                                 vma=out_vma(o4t, d4t, mu)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * 4 * n * e + 12 * n * e,
            bytes_accessed=(2 * 4 * n + 3 * 4 * e + 5 * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bounds.T.reshape(-1), o4t, d4t, mu, mv, mw)
    t, idx = (a.reshape(-1) for a in out)
    return t, idx


# ---------------------------------------------------------------------------
# Rows-returning closest-hit: the kernel selects the winner's barycentrics
# AND fetches its complete shading/material/light row in VMEM (per-tile
# one-hot MXU matmuls against a resident (40, E) table), so the bounce loop
# needs ZERO per-ray XLA gathers afterwards. TPU gathers measured 0.6-1.8 ms
# per 256k rays each; this replaces ~6 of them per bounce with ~0.5 ms of
# in-kernel matmul work.
# ---------------------------------------------------------------------------

TAB_R = 40   # table rows (sublane-aligned)
OUT_R = 48   # output rows: 0:40 table | 40 t | 41 u | 42 v | 43 w_d |
#              44 eidx | 45 steps (triangles actually swept per ray —
#              the real DEBUG_STEPS analog, main.glsl:358-361) |
#              46/47 block-sweep telemetry (every lane carries its
#              BLOCK's taken-sweep count: 46 = phase-A chunk sweeps
#              (superchunk entries for the sc kernel), 47 = phase-B
#              shadow sweeps (chunk sweeps for the sc kernel))


def build_trace_table(scene: Scene) -> jnp.ndarray:
    """(40, E) f32 per-expanded-triangle table, built in-graph (hoist it
    out of the bounce loop by calling once per traced program):

      0:9   world shading normals n0, n1, n2
      9:15  uv0, uv1, uv2
      15    global triangle index (float-exact: tri < 2^24)
      16    instance index (float)
      17:30 material row [albedo3, emission3, energy, metallic, roughness,
            tex, transmission, ior, mr_tex] — live values, folded per
            expanded triangle (primal path only; autodiff uses UNIT)
      30    NEE pdf term pick_prob/area (0 = not an emitter)
      31:34 emitter geometric normal
      34:40 zero padding
    """
    e = scene.isect_shade.shape[0]
    shade = scene.isect_shade  # (E, 16)
    mat_id = shade[:, 15].astype(jnp.int32)
    mat_tbl = jnp.concatenate([
        scene.mat_albedo, scene.mat_emission,
        scene.mat_emission_energy[:, None], scene.mat_metallic[:, None],
        scene.mat_roughness[:, None],
        scene.mat_tex.astype(jnp.float32)[:, None],
        scene.mat_transmission[:, None], scene.mat_ior[:, None],
        scene.mat_mr_tex.astype(jnp.float32)[:, None]], axis=1)  # (M, 13)
    mats = mat_tbl[mat_id]  # (E, 13) — E-sized gather, traced once

    if scene.n_lights > 0:
        from gdpathtracing_tpu.render.lights import build_light_table
        lt = build_light_table(scene)
        li = jnp.clip(scene.isect_light, 0, lt.area.shape[0] - 1)
        is_l = (scene.isect_light >= 0).astype(jnp.float32)
        inv_term = (lt.pick_prob[li] / jnp.maximum(lt.area[li], 1e-8)) * is_l
        lnx = lt.normal.x[li] * is_l
        lny = lt.normal.y[li] * is_l
        lnz = lt.normal.z[li] * is_l
        light_cols = jnp.stack([inv_term, lnx, lny, lnz], axis=1)
    else:
        light_cols = jnp.zeros((e, 4), jnp.float32)

    tab = jnp.concatenate([
        shade[:, 0:15],
        scene.isect_tri.astype(jnp.float32)[:, None],
        scene.isect_inst.astype(jnp.float32)[:, None],
        mats,
        light_cols,
        jnp.zeros((e, TAB_R - 34), jnp.float32),
    ], axis=1)  # (E, 40)
    return tab.T


def _rcp(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)


def _slab(bounds_ref, base, ox, oy, oz, rdx, rdy, rdz):
    """Slab test of the whole ray block against the AABB at scalar-prefetch
    offset `base` → (tmin, tmax) per ray."""
    tx1 = (bounds_ref[base + 0] - ox) * rdx
    tx2 = (bounds_ref[base + 3] - ox) * rdx
    ty1 = (bounds_ref[base + 1] - oy) * rdy
    ty2 = (bounds_ref[base + 4] - oy) * rdy
    tz1 = (bounds_ref[base + 2] - oz) * rdz
    tz2 = (bounds_ref[base + 5] - oz) * rdz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _mm(a, b):  # (4,BN)ᵀ·(4,BT) → (BN, BT)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _m3_layout(mu, mv, mw):
    """Interleave the three unit-triangle row matrices per CHUNK:
    (4, E) x3 → (4, 3E) laid out [c0·mu | c0·mv | c0·mw | c1·mu | ...].
    One streamed (4, 3·BT) block then feeds a whole chunk step — one DMA
    and two wide K=4 MXU ops instead of three DMAs and six narrow ones
    (the matmul results are element-identical; only op count changes).
    Chunk c of any superchunk stays contiguous, so the superchunk kernel
    streams (4, 3·SCC·BT) blocks of the same layout."""
    e = mu.shape[1]
    nc = e // BT

    def r(x):
        return x.reshape(4, nc, 1, BT)

    return jnp.concatenate([r(mu), r(mv), r(mw)], axis=2).reshape(4, 3 * e)


def _uvw(x4, m3):
    """(4, BN) rays × (4, 3·BT) chunk rows → (u, v, w) each (BN, BT)."""
    uvw = _mm(x4, m3)
    bt = m3.shape[1] // 3
    return uvw[:, :bt], uvw[:, bt:2 * bt], uvw[:, 2 * bt:]


def _sweep_update(out_ref, o4, d4, m3, tab_chunk, global_base, may):
    """Sweep one BT-triangle chunk against the ray block and merge winners
    into the resident out block. `m3`: the chunk's (4, 3·BT) interleaved
    mu|mv|mw slice; `tab_chunk`: its (TAB_R, BT) table slice;
    `global_base`: expanded index of the chunk's first triangle (for the
    eidx row); `may`: (BN,) per-ray slab-pass mask — the merge is gated
    per ray so a ray only ever takes hits from chunks ITS OWN (inflated)
    slab test passed, never from sweeps a neighboring lane forced. With
    the lexicographic (t, eidx) tie rule this makes the traversal result
    fully BLOCK-COMPOSITION INDEPENDENT: sorting, regeneration, sharding
    and compaction cannot flip a hit (round-4's allclose-guarded
    ~1e-4-pixel tie-break caveat is gone; _inflate_bounds keeps the gate
    conservative against fp so real grazing hits are not lost)."""
    cur = out_ref[40, :]
    u_o, v_o, w_o = _uvw(o4, m3)
    u_d, v_d, w_d = _uvw(d4, m3)

    wd_ok = jnp.abs(w_d) > _WD_EPS
    inv_wd = jnp.where(wd_ok, w_d, 1.0)
    t = -w_o / inv_wd
    u = u_o + t * u_d
    v = v_o + t * v_d
    valid = wd_ok & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    t = jnp.where(valid, t, _MISS)

    tk = jnp.min(t, axis=1)                      # (BN,)
    # Lexicographic (t, eidx) winner: exact-t ties resolve to the LOWEST
    # expanded-triangle index regardless of chunk visit order, so the
    # result is VISIT-ORDER INDEPENDENT (bit-stable under lane sorting,
    # regeneration, sharding — any block composition) and matches the
    # brute oracle's argmin rule. Within a chunk argmin already picks the
    # first (lowest-eidx) minimum; `tie` handles cross-chunk ties.
    better0 = (tk < cur) & may
    tie = (tk == cur) & (tk < _MISS) & may

    # Winner merge only when some ray actually improved: the argmin, the
    # one-hot, three masked lane-reductions, the (TAB_R, BN) MXU row
    # fetch and five merge-writes are the expensive half of the sweep,
    # and on incoherent wavefronts most later chunks improve nobody.
    # pl.when-skipping them leaves out_ref holding the previous winner —
    # exactly the all-`better`-false result.
    @pl.when(jnp.any(better0 | tie))
    def _():
        k = jnp.argmin(t, axis=1).astype(jnp.int32)  # (BN,)
        cur_e = out_ref[44, :]
        better = better0 | (tie & ((global_base + k).astype(jnp.float32)
                                   < cur_e))
        bf = better.astype(jnp.float32)

        # Winner one-hot (f32: Mosaic only inserts minor dims for 32-bit
        # types, so the bool mask rides along as a multiply).
        bn, bt = t.shape
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (bn, bt), 1)
                  == k[:, None]).astype(jnp.float32) * bf[:, None]

        u_w = jnp.sum(u * onehot, axis=1)
        v_w = jnp.sum(v * onehot, axis=1)
        wd_w = jnp.sum(w_d * onehot, axis=1)

        # Winner's table row: (40, BT) x (BN, BT)ᵀ → (40, BN) on the MXU.
        rows = jax.lax.dot_general(
            tab_chunk, onehot, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

        old = out_ref[0:TAB_R, :]
        bf_row = bf[None, :]
        out_ref[0:TAB_R, :] = old + (rows - old) * bf_row
        out_ref[40, :] = jnp.where(better, tk, cur)
        out_ref[41, :] = jnp.where(better, u_w, out_ref[41, :])
        out_ref[42, :] = jnp.where(better, v_w, out_ref[42, :])
        out_ref[43, :] = jnp.where(better, wd_w, out_ref[43, :])
        out_ref[44, :] = jnp.where(
            better, (global_base + k).astype(jnp.float32), out_ref[44, :])


_USE_QUEUE = True  # perf-decomposition hook: False = centroid order, no
#                    candidacy packing (costs DMA on culled steps but
#                    skips the per-ray XLA slab pass — isolates the
#                    queue-construction cost in regen_decompose2)


def _block_chunk_queue(o4t, d4t, chunk_bounds, tmax=None, extra=None):
    """(n_blocks, nc) i32 per-block PACKED chunk visit queue with sentinel
    padding — the work-queue form of near-to-far ordered traversal.

    Entry semantics: a value ``v < nc`` is a CANDIDATE chunk id — some
    ray in the block passes the conservative slab test against it (the
    exact per-ray test the kernel itself runs, minus the dynamic
    ``tmin < cur`` cut). A value ``v >= nc`` is skip-padding encoding
    chunk ``v - nc``: the kernel culls the whole step, and because the
    encoded id repeats the block's LAST candidate, the streaming index
    map keeps the same chunk block resident — Pallas elides the DMA for
    consecutive equal block indices, so a padded grid step costs one
    scalar compare instead of a chunk DMA + slab sweep. Previous rounds
    ordered ALL nc chunks per block (centroid-distance argsort), so
    every culled chunk still paid its streaming DMA each step.

    Candidates are ordered near-to-far by the block-min entry distance
    (min over passing rays of max(tmin, 0)): front-to-back is what makes
    the in-kernel ``tmin < cur`` cull fire, the stackless analog of
    ordered BVH descent (main.glsl:337-338). The winner is visit-order
    independent, so results are unchanged; only swept-chunk counts drop.

    ``tmax``: optional (N,) per-ray upper bound (shadow rays) — chunks
    entered beyond it are not candidates. ``extra=(o4t, d4t, tmax)``: a
    second ray set sharing the sweep (fused NEE phase B); the queue is
    the union of both sets' candidates, keyed by the elementwise-min
    distance. Parked rays (origin 1e9, diagonal direction) fail every
    slab and contribute no candidates. The per-ray slab here runs in
    XLA; a tiny slack keeps it conservative against Mosaic's fp
    association so a kernel-swept chunk is always a candidate."""
    nc = chunk_bounds.shape[1]
    nb = o4t.shape[1] // BN
    if not _USE_QUEUE:  # decomposition hook: centroid order, all-real
        return _block_chunk_order(o4t, chunk_bounds)

    def set_key(o4t, d4t, tmax_b):
        ox, oy, oz = o4t[0], o4t[1], o4t[2]
        dx, dy, dz = d4t[0], d4t[1], d4t[2]
        rdx, rdy, rdz = _rcp(dx), _rcp(dy), _rcp(dz)
        cols = []
        for c in range(nc):
            tmin, tmax_ = _slab(chunk_bounds[:, c], 0, ox, oy, oz,
                                rdx, rdy, rdz)
            slack = 1e-5 * jnp.abs(tmax_) + 1e-6
            ok = (tmax_ + slack >= tmin) & (tmax_ > -1e-6)
            if tmax_b is not None:
                ok = ok & (tmin < tmax_b + slack)
            key = jnp.where(ok, jnp.maximum(tmin, 0.0), jnp.inf)
            cols.append(jnp.min(key.reshape(nb, BN), axis=1))
        return jnp.stack(cols, axis=1)  # (nb, nc)

    key = set_key(o4t, d4t, tmax)
    if extra is not None:
        key = jnp.minimum(key, set_key(*extra))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    ncand = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
    last = order[jnp.arange(nb), jnp.maximum(ncand - 1, 0)]
    iota = jnp.arange(nc, dtype=jnp.int32)[None, :]
    return jnp.where(iota < ncand[:, None], order,
                     last[:, None] + jnp.int32(nc))


SUB = 2      # sub-chunks per chunk for the phase-B (shadow any-hit)
#              refinement: each swept chunk is slab-culled again at
#              BT//SUB = 128-triangle granularity before its sub-sweep.
#              128 is the sweet spot: VPU arrays pad their minor dim to
#              128 lanes anyway, so a 64-wide sub-sweep costs the same
#              as a 128-wide one — only the extra slab tests would pay.


def _inflate_bounds(cb):
    """(8, nc) bounds → slightly inflated copy. The per-ray merge gate
    (see _sweep_update `may`) requires that a ray whose triangle-hit the
    sweep would find always passes ITS OWN slab test; inflating by ~100
    ulp absorbs the fp slack between slab arithmetic and exact geometric
    containment. Pure conservatism — sweeps can only fire more often."""
    lo, hi, pad = cb[0:3], cb[3:6], cb[6:8]
    eps = 1e-5 * jnp.maximum(jnp.abs(lo), jnp.abs(hi)) + 1e-6
    return jnp.concatenate([lo - eps, hi + eps, pad], axis=0)


def _sub_bounds(scene: Scene) -> jnp.ndarray:
    """(SUB·nc·8,) flattened sub-chunk AABBs (same [min3|max3|pad2] row
    layout as chunk bounds) over the expanded triangle list, computed
    from world-space vertices (tri_pos × inst_transform). Pad triangles
    (zero unit-matrix columns) get an empty box so they never inflate a
    sub-chunk. E-sized, traced once per program (hoist via prep)."""
    tf = scene.inst_transform[scene.isect_inst]      # (E, 3, 4)
    tp = scene.tri_pos[scene.isect_tri]              # (E, 3, 3) object
    world = jnp.einsum("eab,evb->eva", tf[:, :, :3], tp) \
        + tf[:, None, :, 3]                          # (E, 3, 3) world
    real = (jnp.abs(scene.isect_mu).sum(axis=0) > 0.0)[:, None]  # (E, 1)
    vlo = jnp.where(real, world.min(axis=1), jnp.inf)    # (E, 3)
    vhi = jnp.where(real, world.max(axis=1), -jnp.inf)
    e = vlo.shape[0]
    ns = e // (BT // SUB)
    lo = vlo.reshape(ns, BT // SUB, 3).min(axis=1)
    hi = vhi.reshape(ns, BT // SUB, 3).max(axis=1)
    # Empty sub-chunks (all pads): point box far away → slab never passes.
    empty = ~jnp.isfinite(lo[:, 0])
    lo = jnp.where(empty[:, None], 1e30, lo)
    hi = jnp.where(empty[:, None], 1e30, hi)
    return _inflate_bounds(
        jnp.concatenate([lo, hi, jnp.zeros((ns, 2), jnp.float32)],
                        axis=1).T).T.reshape(-1)


def _block_chunk_order(o4t, chunk_bounds, extra_o4t=None):
    """(n_blocks, nc) i32 near-to-far chunk order by block ORIGIN-CENTROID
    distance (no candidacy packing). Kept for the MEGA kernel, whose
    fused phase-A/B grid walks one shared full order; the wavefront
    kernels all use `_block_chunk_queue` (exact per-ray candidacy +
    sentinel skip-steps) instead."""
    nc = chunk_bounds.shape[1]
    ox = o4t[0].reshape(-1, BN)
    oy = o4t[1].reshape(-1, BN)
    oz = o4t[2].reshape(-1, BN)
    if extra_o4t is not None:
        ox = jnp.concatenate([ox, extra_o4t[0].reshape(-1, BN)], axis=1)
        oy = jnp.concatenate([oy, extra_o4t[1].reshape(-1, BN)], axis=1)
        oz = jnp.concatenate([oz, extra_o4t[2].reshape(-1, BN)], axis=1)
    live = (jnp.abs(ox) < 1e8).astype(jnp.float32)
    wsum = jnp.maximum(live.sum(axis=1), 1.0)
    cx = (ox * live).sum(axis=1) / wsum
    cy = (oy * live).sum(axis=1) / wsum
    cz = (oz * live).sum(axis=1) / wsum
    lo = chunk_bounds[0:3]  # (3, nc)
    hi = chunk_bounds[3:6]

    def ax(c, a):
        return jnp.maximum(jnp.maximum(lo[a][None, :] - c[:, None],
                                       c[:, None] - hi[a][None, :]), 0.0)

    dx, dy, dz = ax(cx, 0), ax(cy, 1), ax(cz, 2)
    dist2 = dx * dx + dy * dy + dz * dz  # (n_blocks, nc)
    return jnp.argsort(dist2, axis=1).astype(jnp.int32)


def _queue_decode(nc: int):
    """Scalar-prefetch index map helper: decode a queue entry to its
    chunk block index (sentinel entries map back to the repeated last
    candidate, keeping the resident block unchanged → no DMA)."""
    def decode(v):
        return jnp.where(v >= nc, v - nc, v)
    return decode


def _kernel_rows(chunk_ref, order_ref, o4_ref, d4_ref, m3_ref,
                 tab_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((OUT_R, out_ref.shape[1]), jnp.float32)
        out_ref[40, :] = jnp.full((out_ref.shape[1],), _MISS, jnp.float32)

    o4 = o4_ref[...]  # (4, BN)
    d4 = d4_ref[...]
    cur = out_ref[40, :]

    bt = m3_ref.shape[1] // 3
    nc = pl.num_programs(1)
    v = order_ref[i * nc + j]  # this block's j-th queue entry
    cid = jnp.where(v >= nc, v - nc, v)  # sentinel decode (skip-step)

    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    tmin, tmax = _slab(chunk_ref, cid * 8, ox, oy, oz,
                       _rcp(dx), _rcp(dy), _rcp(dz))
    may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin <= cur) & (v < nc)

    @pl.when(jnp.any(may_hit))
    def _():
        # Per-ray sweep cost: rays whose slab test passed pay BT triangle
        # tests this step (the whole chunk is swept for the block, but a
        # culled ray's lanes do no useful work — count the chunk for the
        # rays that actually needed it).
        out_ref[45, :] = out_ref[45, :] + jnp.where(may_hit, float(bt), 0.0)
        # Row 46: sweeps this BLOCK actually took (telemetry — every lane
        # carries the block's count; divergence shows as 46 >> 45/BT).
        out_ref[46, :] = out_ref[46, :] + 1.0
        _sweep_update(out_ref, o4, d4, m3_ref[...],
                      tab_ref[:, pl.ds(cid * bt, bt)], cid * bt, may_hit)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_hit_rows(o4t, d4t, chunk_bounds, m3, tab,
                      interpret=False):
    """o4t/d4t: (4, N); tab: (40, E). Returns (OUT_R, N) packed hit rows.
    The output is written directly in (48, N) layout — block (48, BN) at
    column i — so consumers slice contiguous component rows with no
    transpose, and VMEM use stays constant in N (unlike the full-array
    (gr, BN) blocks of `_closest_hit`): arbitrarily large wavefronts fit
    one kernel call."""
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    nc = e // BT
    grid = (n // BN, nc)

    # Per-block packed candidate queue (near-to-far + sentinel padding),
    # consumed both by the streaming index maps (which chunk block to DMA
    # at step (i, j) — sentinel steps keep the previous block resident,
    # eliding the DMA) and by the kernel (slab bounds / table offsets).
    chunk_bounds = _inflate_bounds(chunk_bounds)
    order = _block_chunk_queue(o4t, d4t, chunk_bounds).reshape(-1)
    dec = _queue_decode(nc)

    def cmap(i, j, cb_ref, ord_ref):
        return (0, dec(ord_ref[i * nc + j]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, 3 * BT), cmap),
            pl.BlockSpec((TAB_R, e), lambda i, j, *_: (0, 0)),  # resident
        ],
        out_specs=[
            pl.BlockSpec((OUT_R, BN), lambda i, j, *_: (0, i)),
        ],
    )
    (out,) = pl.pallas_call(
        _kernel_rows,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((OUT_R, n), jnp.float32,
                                        vma=out_vma(o4t, d4t, m3, tab))],
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * 4 * n * e + 12 * n * e + 2 * TAB_R * n * e,
            bytes_accessed=(2 * 4 * n + 3 * 4 * e + TAB_R * e
                            + OUT_R * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bounds.T.reshape(-1), order, o4t, d4t, m3, tab)
    return out


def _kernel_rows_nee(chunk_ref, sub_ref, order_ref, o4_ref, d4_ref,
                     so4_ref, sd4_ref, stmax_ref, m3_ref, tab_ref,
                     out_ref, occ_ref):
    """Fused per-bounce sweep: phase A closest-hit for the bounce rays +
    phase B any-hit occlusion for the PREVIOUS bounce's shadow rays, in the
    same (ray-block x chunk) grid step — both phases share the step's
    chunk DMA (mu/mv/mw block) and the grid overhead that a separate
    occlusion dispatch would pay again. The TPU-native form of the
    reference's single-kernel direct+indirect lighting (main.glsl:372-436):
    the integrator defers bounce i's shadow resolution into bounce i+1's
    dispatch, preserving the radiance accumulation order (transport is
    unchanged; results match the unfused path to ≤1 ulp — only XLA's
    FMA-contraction choices differ between the two graphs)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((OUT_R, out_ref.shape[1]), jnp.float32)
        out_ref[40, :] = jnp.full((out_ref.shape[1],), _MISS, jnp.float32)
        occ_ref[0, :] = jnp.zeros((occ_ref.shape[1],), jnp.int32)

    bt = m3_ref.shape[1] // 3
    nc = pl.num_programs(1)
    v = order_ref[i * nc + j]
    cid = jnp.where(v >= nc, v - nc, v)  # sentinel decode (skip-step)
    is_real = v < nc

    # Phase A — identical to _kernel_rows.
    o4 = o4_ref[...]
    d4 = d4_ref[...]
    cur = out_ref[40, :]
    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    tmin, tmax = _slab(chunk_ref, cid * 8, ox, oy, oz,
                       _rcp(dx), _rcp(dy), _rcp(dz))
    may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin <= cur) & is_real

    @pl.when(jnp.any(may_hit))
    def _():
        out_ref[45, :] = out_ref[45, :] + jnp.where(may_hit, float(bt), 0.0)
        out_ref[46, :] = out_ref[46, :] + 1.0  # phase-A block sweeps
        _sweep_update(out_ref, o4, d4, m3_ref[...],
                      tab_ref[:, pl.ds(cid * bt, bt)], cid * bt, may_hit)

    # Phase B — identical to _occlusion_kernel's update; skips once the
    # whole shadow block is resolved (occ != 0) or culled.
    so4 = so4_ref[...]
    sd4 = sd4_ref[...]
    s_tmax = stmax_ref[0, :]
    occ = occ_ref[0, :]
    sox, soy, soz = so4[0, :], so4[1, :], so4[2, :]
    sdx, sdy, sdz = sd4[0, :], sd4[1, :], sd4[2, :]
    smin, smax = _slab(chunk_ref, cid * 8, sox, soy, soz,
                       _rcp(sdx), _rcp(sdy), _rcp(sdz))
    s_may = (smax >= smin) & (smax > 0.0) & (smin < s_tmax) & (occ == 0) \
        & is_real

    @pl.when(jnp.any(s_may))
    def _():
        out_ref[47, :] = out_ref[47, :] + 1.0  # phase-B block sweeps
        m3 = m3_ref[...]
        sw = bt // SUB
        # Sub-chunk refinement: re-cull at BT//SUB granularity before
        # each sub-sweep — a shadow segment grazing a chunk AABB usually
        # crosses only one of its (spatially disjoint, Morton-ordered)
        # halves, and an any-hit query has no winner bookkeeping, so the
        # narrow sweep is pure savings (the finer-than-block resolution
        # culling VERDICT r4 item 3 called for).
        for s in range(SUB):
            ssmin, ssmax = _slab(sub_ref, (cid * SUB + s) * 8,
                                 sox, soy, soz,
                                 _rcp(sdx), _rcp(sdy), _rcp(sdz))
            occ_now = occ_ref[0, :]
            s_may_s = (ssmax >= ssmin) & (ssmax > 0.0) & \
                (ssmin < s_tmax) & (occ_now == 0)

            @pl.when(jnp.any(s_may_s))
            def _(s=s, occ_now=occ_now):
                mu_s = m3[:, s * sw:(s + 1) * sw]
                mv_s = m3[:, bt + s * sw:bt + (s + 1) * sw]
                mw_s = m3[:, 2 * bt + s * sw:2 * bt + (s + 1) * sw]
                w_o = _mm(so4, mw_s)
                w_d = _mm(sd4, mw_s)
                wd_ok = jnp.abs(w_d) > _WD_EPS
                inv_wd = jnp.where(wd_ok, w_d, 1.0)
                t = -w_o / inv_wd
                u = _mm(so4, mu_s) + t * _mm(sd4, mu_s)
                v2 = _mm(so4, mv_s) + t * _mm(sd4, mv_s)
                # Mosaic can only insert minor dims for 32-bit types:
                # broadcast the per-ray gate as i32, not bool.
                gate = s_may_s.astype(jnp.int32)[:, None] > 0
                blocked = wd_ok & (t > 0.0) & (t < s_tmax[:, None]) & \
                    (u >= 0.0) & (v2 >= 0.0) & (u + v2 <= 1.0) & gate
                occ_ref[0, :] = occ_now | \
                    jnp.any(blocked, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_hit_rows_nee(o4t, d4t, so4t, sd4t, stmax, chunk_bounds,
                          sub_flat, m3, tab, interpret=False):
    """Fused dispatch: (OUT_R, N) packed closest-hit rows for (o4t, d4t)
    AND (N,) i32 occlusion flags for the shadow set (so4t, sd4t, stmax).
    Flat (≤16-chunk) scenes only — superchunk scenes keep the separate
    occlusion dispatch."""
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    nc = e // BT
    grid = (n // BN, nc)

    # Union queue: a chunk is a candidate if EITHER phase's rays pass
    # its slab (phase B bounded by stmax); keyed by the min entry
    # distance so one near-to-far order serves both phases.
    chunk_bounds = _inflate_bounds(chunk_bounds)
    order = _block_chunk_queue(o4t, d4t, chunk_bounds,
                               extra=(so4t, sd4t, stmax)).reshape(-1)
    dec = _queue_decode(nc)

    def cmap(i, j, cb_ref, sub_ref, ord_ref):
        return (0, dec(ord_ref[i * nc + j]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),   # o4
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),   # d4
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),   # shadow o4
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),   # shadow d4
            pl.BlockSpec((1, BN), lambda i, j, *_: (0, i)),   # shadow tmax
            pl.BlockSpec((4, 3 * BT), cmap),
            pl.BlockSpec((TAB_R, e), lambda i, j, *_: (0, 0)),  # resident
        ],
        out_specs=[
            pl.BlockSpec((OUT_R, BN), lambda i, j, *_: (0, i)),
            # (1, n) with a (1, BN) block at column i: the sublane dim
            # equals the whole array's (TPU tiling rule), and the index
            # map is j-invariant so the block stays VMEM-resident across
            # the chunk sweep.
            pl.BlockSpec((1, BN), lambda i, j, *_: (0, i)),
        ],
    )
    vma = out_vma(o4t, d4t, so4t, sd4t, m3, tab)
    out, occ = pl.pallas_call(
        _kernel_rows_nee,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((OUT_R, n), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((1, n), jnp.int32, vma=vma)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * 6 * 4 * n * e + 12 * n * e) + 2 * TAB_R * n * e,
            bytes_accessed=(4 * 4 * n + 3 * 4 * e + TAB_R * e
                            + (OUT_R + 1) * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_bounds.T.reshape(-1), sub_flat, order, o4t, d4t, so4t, sd4t,
      stmax.reshape(1, n), m3, tab)
    return out, occ.reshape(-1)


def trace_occlude_pallas(scene: Scene, ray: Ray, active,
                         sh_ray: Ray, sh_tmax, sh_active,
                         interpret: bool = False,
                         prep: "_TracePrep | None" = None):
    """Closest-hit for `ray` + any-hit occlusion for `sh_ray` in ONE fused
    kernel dispatch (the integrator's deferred-shadow NEE path; the
    reference resolves direct light inside the same kernel as the bounce,
    though its transport has no NEE — README.md:36 wishlist). Returns
    (HitInfo-with-rows, occluded: (N,) bool). t/u/v/occ match the separate
    trace_pallas / occluded_pallas calls up to visit-order-dependent
    tie-breaks: the union candidate queue (`_block_chunk_queue` with the
    shadow set) can permute a block's chunk visit order, so exact-t ties
    may pick a different winning triangle and the steps AOV may differ —
    tests/test_nee.py::test_trace_occlude_pallas_unit covers the
    practical equality."""
    interpret = interpret or _FORCE_INTERPRET
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN
    far, s3 = 1e9, 0.5773503

    ox, oy, oz = ray.o.x, ray.o.y, ray.o.z
    dx, dy, dz = ray.d.x, ray.d.y, ray.d.z
    if active is not None:
        ox = jnp.where(active, ox, far)
        oy = jnp.where(active, oy, far)
        oz = jnp.where(active, oz, far)
        dx = jnp.where(active, dx, s3)
        dy = jnp.where(active, dy, s3)
        dz = jnp.where(active, dz, s3)

    sox = jnp.where(sh_active, sh_ray.o.x, far)
    soy = jnp.where(sh_active, sh_ray.o.y, far)
    soz = jnp.where(sh_active, sh_ray.o.z, far)
    sdx = jnp.where(sh_active, sh_ray.d.x, s3)
    sdy = jnp.where(sh_active, sh_ray.d.y, s3)
    sdz = jnp.where(sh_active, sh_ray.d.z, s3)
    stm = jnp.where(sh_active, sh_tmax, 0.0)

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ox, 1e9), pad(oy, 1e9), pad(oz, 1e9),
                     pad(ox * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(dx, 1.0), pad(dy, 1.0), pad(dz, 1.0),
                     pad(dx * 0)], axis=0)
    so4t = jnp.stack([pad(sox, 1e9), pad(soy, 1e9), pad(soz, 1e9),
                      pad(sox * 0 + 1.0)], axis=0)
    sd4t = jnp.stack([pad(sdx, 1.0), pad(sdy, 1.0), pad(sdz, 1.0),
                      pad(sdx * 0)], axis=0)

    if prep is None:
        prep = prepare_trace_inputs(scene)
    assert not prep.superchunks, \
        "trace_occlude_pallas is flat-scene only (≤16 chunks)"
    rows, occ = _closest_hit_rows_nee(
        o4t, d4t, so4t, sd4t, pad(stm), scene.isect_chunk_bounds,
        prep.sub_flat, prep.m3, prep.tab, interpret=interpret)
    rows = rows[:, :n]
    occ = occ[:n]

    t = rows[40]
    u = jnp.clip(rows[41], 0.0, 1.0)
    v = jnp.clip(rows[42], 0.0, 1.0)
    front = rows[43] < 0.0
    eidx = rows[44].astype(jnp.int32)
    tri = rows[15].astype(jnp.int32)
    inst = rows[16].astype(jnp.int32)
    if active is not None:
        t = jnp.where(active, t, MISS_T)
    steps = rows[45].astype(jnp.int32)
    hit = HitInfo(t=t, tri=tri, inst=inst, u=u, v=v,
                  front=front, steps=steps, eidx=eidx, rows=rows)
    return hit, occ.astype(bool) & sh_active


# ---------------------------------------------------------------------------
# Two-level (superchunk) variant for large scenes: the flat grid pays one
# grid step per (ray-block x chunk) even when culled — O(N/BN x E/BT) steps
# swamps big scenes. Here the grid's minor axis runs over SUPERCHUNKS of
# SCC chunks: one slab test per superchunk, and only superchunks that pass
# run an in-kernel fori over their chunks (each chunk pl.when-guarded).
# ---------------------------------------------------------------------------

SCC = 8  # chunks per superchunk (SCC*BT = 2048 triangles). Round-5
#          isolated-kernel sweep: the sc kernel's cost is dominated by
#          per-step/branch machinery that scales with the unrolled BODY
#          size, not by DMA — SCC=8 measured 40.4/1429 ms per 524k-ray
#          trace (camera/random) vs 169/2525 at SCC=16 on the grid
#          scene (campaign r5f).


def _kernel_rows_sc(sc_ref, chunk_ref, ord_ref, o4_ref, d4_ref, m3_ref,
                    tab_ref, out_ref, *, scc):
    # The inner chunk loop is STATICALLY UNROLLED: in-kernel
    # fori_loop/cond kernels fault or hang inside large frame graphs on
    # this toolchain (observed twice: the round-1 fori+cond sweep, and a
    # fori+pl.when variant of this kernel crashing the TPU worker), while
    # straight-line bodies under pl.when are rock solid.
    # `ord_ref`: per-block near-to-far SUPERCHUNK visit order (the same
    # front-to-back indirection as _kernel_rows — near superchunks fill
    # `cur` first, so far ones fail `tmin < cur` for the whole block).
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((OUT_R, out_ref.shape[1]), jnp.float32)
        out_ref[40, :] = jnp.full((out_ref.shape[1],), _MISS, jnp.float32)

    nsc = pl.num_programs(1)
    qv = ord_ref[i * nsc + j]
    scid = jnp.where(qv >= nsc, qv - nsc, qv)  # sentinel decode

    o4 = o4_ref[...]
    d4 = d4_ref[...]
    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    rdx, rdy, rdz = _rcp(dx), _rcp(dy), _rcp(dz)

    cur = out_ref[40, :]
    s_tmin, s_tmax = _slab(sc_ref, scid * 8, ox, oy, oz, rdx, rdy, rdz)
    sc_may = (s_tmax >= s_tmin) & (s_tmax > 0.0) & (s_tmin <= cur) \
        & (qv < nsc)

    @pl.when(jnp.any(sc_may))
    def _():
        out_ref[46, :] = out_ref[46, :] + 1.0  # superchunk entries (telem)
        for c in range(scc):  # static unroll
            cur_c = out_ref[40, :]
            tmin, tmax = _slab(chunk_ref, (scid * scc + c) * 8,
                               ox, oy, oz, rdx, rdy, rdz)
            may = (tmax >= tmin) & (tmax > 0.0) & (tmin <= cur_c)

            @pl.when(jnp.any(may))
            def _(c=c, may=may):
                out_ref[45, :] = out_ref[45, :] + \
                    jnp.where(may, float(BT), 0.0)
                out_ref[47, :] = out_ref[47, :] + 1.0  # chunk sweeps
                _sweep_update(out_ref, o4, d4,
                              m3_ref[:, pl.ds(c * 3 * BT, 3 * BT)],
                              tab_ref[:, pl.ds(c * BT, BT)],
                              (scid * scc + c) * BT, may)


@functools.partial(jax.jit, static_argnames=("scc", "interpret"))
def _closest_hit_rows_sc(o4t, d4t, sc_flat, chunk_flat, m3, tab,
                         scc=SCC, interpret=False):
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    nsc = e // (BT * scc)
    grid = (n // BN, nsc)
    bts = BT * scc

    # Per-block packed SUPERCHUNK candidate queue (sc_flat rows are the
    # same 8-float [min3|max3|pad2] layout as chunk bounds). Sentinel
    # padding matters most here: a skipped superchunk step would
    # otherwise stream its (4, 3·SCC·BT) m3 + (TAB_R, SCC·BT) table
    # blocks (~850 KB) just to fail one slab test.
    order = _block_chunk_queue(o4t, d4t,
                               sc_flat.reshape(nsc, 8).T).reshape(-1)
    dec = _queue_decode(nsc)

    def scmap(i, j, sc_ref, cb_ref, ord_ref):
        return (0, dec(ord_ref[i * nsc + j]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # superchunk + chunk bounds + order → SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, 3 * bts), scmap),
            pl.BlockSpec((TAB_R, bts), scmap),
        ],
        out_specs=[
            pl.BlockSpec((OUT_R, BN), lambda i, j, *_: (0, i)),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_kernel_rows_sc, scc=scc),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((OUT_R, n), jnp.float32,
                                        vma=out_vma(o4t, d4t, m3, tab))],
        interpret=interpret,
    )(sc_flat, chunk_flat, order, o4t, d4t, m3, tab)
    return out


LITE_R = 8  # lite sc out rows: 0 t | 1 eidx (exact f32) | 2 steps |
#             3 block sweeps (telemetry) | 4-7 pad
_SC_LITE = True  # superchunk scenes: use the lite kernel + XLA gather
#                  epilogue (A/B hook; the rows variant streams a
#                  (40, SCC·BT) table block per entered superchunk and
#                  pays the winner rows-merge per sweep)
_SC_RESIDENT_BYTES = 8 << 20  # lite kernel keeps the whole m3 VMEM-
#                  resident; scenes beyond this take the streamed rows
#                  variant (v5e VMEM is 16 MB per core — leave room for
#                  ray/out blocks and double buffers)


def _kernel_sc_lite(sc_ref, chunk_ref, ord_ref, o4_ref, d4_ref, m3_ref,
                    out_ref, *, scc):
    """Two-level closest hit WITHOUT the packed-rows epilogue: only
    (t, eidx, steps) leave the kernel, so no (TAB_R, SCC·BT) table block
    streams per superchunk (77% of the rows variant's per-step DMA) and
    no one-hot/rows matmul runs per sweep. The wrapper recomputes
    u/v/front from the winner's isect_cols row and shading falls back to
    the (still packed-row) XLA gathers — the right trade on big
    incoherent scenes where sweeps, not shading fetches, dominate.
    Same statically-unrolled structure and lexicographic (t, eidx)
    winner as _kernel_rows_sc.

    The WHOLE m3 stays VMEM-RESIDENT (constant index map): the isolated
    kernel bench measured ~3.7 µs per grid step in the streamed variant
    — per-step DMA issue/wait, 25x the flat kernel's step cost, and the
    entire grid-scene cost. A 100k-triangle scene's m3 is only ~4.6 MB,
    so each superchunk's slice is taken in-VMEM with a dynamic lane
    slice instead of a streamed block. Scenes whose m3 exceeds
    _SC_RESIDENT_BYTES take the rows (streamed) variant."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((LITE_R, out_ref.shape[1]), jnp.float32)
        out_ref[0, :] = jnp.full((out_ref.shape[1],), _MISS, jnp.float32)

    nsc = pl.num_programs(1)
    qv = ord_ref[i * nsc + j]
    scid = jnp.where(qv >= nsc, qv - nsc, qv)  # sentinel decode

    o4 = o4_ref[...]
    d4 = d4_ref[...]
    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    rdx, rdy, rdz = _rcp(dx), _rcp(dy), _rcp(dz)

    cur = out_ref[0, :]
    s_tmin, s_tmax = _slab(sc_ref, scid * 8, ox, oy, oz, rdx, rdy, rdz)
    sc_may = (s_tmax >= s_tmin) & (s_tmax > 0.0) & (s_tmin <= cur) \
        & (qv < nsc)

    @pl.when(jnp.any(sc_may))
    def _():
        out_ref[3, :] = out_ref[3, :] + 1.0  # superchunk entries (telem)
        _lite_sc_sweep(out_ref, o4, d4, chunk_ref, m3_ref, scid,
                       ox, oy, oz, rdx, rdy, rdz, scc)


def _lite_sc_sweep(out_ref, o4, d4, chunk_ref, m3_ref, scid,
                   ox, oy, oz, rdx, rdy, rdz, scc):
    """One superchunk's statically-unrolled chunk sweep for the lite-row
    (t/eidx/steps) kernels — shared by _kernel_sc_lite and the march
    kernel. Winner rule: lexicographic (t, eidx), per-ray slab gates."""
    for c in range(scc):  # static unroll (RUNTIME_BUG.md rule)
        cur_c = out_ref[0, :]
        tmin, tmax = _slab(chunk_ref, (scid * scc + c) * 8,
                           ox, oy, oz, rdx, rdy, rdz)
        may = (tmax >= tmin) & (tmax > 0.0) & (tmin <= cur_c)

        @pl.when(jnp.any(may))
        def _(c=c, may=may):
            out_ref[2, :] = out_ref[2, :] + \
                jnp.where(may, float(BT), 0.0)
            m3c = m3_ref[:, pl.ds((scid * scc + c) * 3 * BT, 3 * BT)]
            u_o, v_o, w_o = _uvw(o4, m3c)
            u_d, v_d, w_d = _uvw(d4, m3c)
            wd_ok = jnp.abs(w_d) > _WD_EPS
            inv_wd = jnp.where(wd_ok, w_d, 1.0)
            t = -w_o / inv_wd
            u = u_o + t * u_d
            v = v_o + t * v_d
            valid = wd_ok & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & \
                (u + v <= 1.0)
            t = jnp.where(valid, t, _MISS)
            tk = jnp.min(t, axis=1)
            cur2 = out_ref[0, :]
            cur_e = out_ref[1, :]
            better0 = (tk < cur2) & may
            tie = (tk == cur2) & (tk < _MISS) & may

            @pl.when(jnp.any(better0 | tie))
            def _(t=t, tk=tk, cur2=cur2, cur_e=cur_e,
                  better0=better0, tie=tie, c=c):
                k = jnp.argmin(t, axis=1).astype(jnp.int32)
                eidx = ((scid * scc + c) * BT + k).astype(jnp.float32)
                better = better0 | (tie & (eidx < cur_e))
                out_ref[0, :] = jnp.where(better, tk, cur2)
                out_ref[1, :] = jnp.where(better, eidx, cur_e)


@functools.partial(jax.jit, static_argnames=("scc", "interpret"))
def _closest_hit_sc_lite(o4t, d4t, sc_flat, chunk_flat, m3,
                         scc=SCC, interpret=False):
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    nsc = e // (BT * scc)
    grid = (n // BN, nsc)
    bts = BT * scc

    order = _block_chunk_queue(o4t, d4t,
                               sc_flat.reshape(nsc, 8).T).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            # RESIDENT: whole m3, constant index map — no per-step DMA.
            pl.BlockSpec((4, 3 * e), lambda i, j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((LITE_R, BN), lambda i, j, *_: (0, i)),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_kernel_sc_lite, scc=scc),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((LITE_R, n), jnp.float32,
                                        vma=out_vma(o4t, d4t, m3))],
        interpret=interpret,
    )(sc_flat, chunk_flat, order, o4t, d4t, m3)
    return out


# ---------------------------------------------------------------------------
# Frontier-march traversal (round 5b): the incoherent-scene fix. A mixed
# wavefront's blocks want ~every superchunk, so the one-shot sc kernels
# sweep O(all chunks) per block (grid scene: ~2.6 µs/ray random vs
# ~0.08 coherent — campaign r5h2). Marching advances each ray at most
# ONE superchunk per regen iteration and the regen loop re-sorts lanes
# by their NEXT superchunk, so every block sweeps only the <=QL distinct
# superchunks its rays actually want — the wavefront analog of ordered
# per-ray BVH descent (reference main.glsl:305-350), built from sorting
# instead of per-thread stacks. All march bookkeeping lives in XLA: the
# kernel only (a) starts from a carried-in running best instead of MISS
# and (b) sweeps the queue it is given. Sweeps are idempotent and sound
# for ANY superchunk (per-ray slab + lexicographic (t, eidx) merge), so
# extra sweeps never flip a result — the composition-independence
# invariant extends to march schedules.
# ---------------------------------------------------------------------------


def _kernel_sc_march(sc_ref, chunk_ref, ord_ref, o4_ref, d4_ref, init_ref,
                     m3_ref, out_ref, *, scc, nsc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ql = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((LITE_R, out_ref.shape[1]), jnp.float32)
        out_ref[0, :] = init_ref[0, :]  # carried-in best t
        out_ref[1, :] = init_ref[1, :]  # carried-in best eidx (f32 value)

    qv = ord_ref[i * ql + j]
    scid = jnp.where(qv >= nsc, qv - nsc, qv)  # sentinel decode

    o4 = o4_ref[...]
    d4 = d4_ref[...]
    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    rdx, rdy, rdz = _rcp(dx), _rcp(dy), _rcp(dz)

    cur = out_ref[0, :]
    s_tmin, s_tmax = _slab(sc_ref, scid * 8, ox, oy, oz, rdx, rdy, rdz)
    sc_may = (s_tmax >= s_tmin) & (s_tmax > 0.0) & (s_tmin <= cur) \
        & (qv < nsc)

    @pl.when(jnp.any(sc_may))
    def _():
        out_ref[3, :] = out_ref[3, :] + 1.0  # superchunk entries (telem)
        _lite_sc_sweep(out_ref, o4, d4, chunk_ref, m3_ref, scid,
                       ox, oy, oz, rdx, rdy, rdz, scc)


@functools.partial(jax.jit, static_argnames=("scc", "nsc", "interpret"))
def _march_step_sc(o4t, d4t, init2, queue, sc_flat, chunk_flat, m3,
                   scc, nsc, interpret=False):
    """One march round: sweep each block's <=QL queued superchunks,
    merging into the carried-in best. Returns (LITE_R, n) lite rows
    (t | eidx | tri-tests | sc-entries)."""
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    ql = queue.shape[0] // (n // BN)
    grid = (n // BN, ql)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((2, BN), lambda i, j, *_: (0, i)),
            # RESIDENT m3 (same envelope as the lite kernel)
            pl.BlockSpec((4, 3 * e), lambda i, j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((LITE_R, BN), lambda i, j, *_: (0, i)),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_kernel_sc_march, scc=scc, nsc=nsc),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((LITE_R, n), jnp.float32,
                                        vma=out_vma(o4t, d4t, m3, init2))],
        interpret=interpret,
    )(sc_flat, chunk_flat, queue, o4t, d4t, init2, m3)
    return out


def march_next_candidates(prep: "_TracePrep", o, d, alive, m_t, m_sc, b_t,
                          k: int = 3):
    """The march's XLA-side candidate scan: each ray's next K
    unprocessed superchunks in (entry, scid) lexicographic near-to-far
    order, culled by the running best (entry <= b_t keeps exact-tie
    sweeps so the lexicographic winner matches the one-shot kernels).
    `(m_t, m_sc)` is the march cursor: everything lex-<= it is already
    processed. Conservative by the same slack rule as the block queues.
    K candidates enable the K-step advance: a lane moves through EVERY
    carried candidate its block's queue swept this round, so aligned
    blocks retire several superchunks per iteration instead of paying a
    full glue iteration per superchunk. Returns (es, ss): two K-lists
    of (n,) arrays in near-to-far order; s == nsc means none."""
    sc_b = prep.sc_flat.reshape(-1, 8).T  # (8, nsc) inflated bounds
    nsc = sc_b.shape[1]
    rdx, rdy, rdz = _rcp(d.x), _rcp(d.y), _rcp(d.z)
    inf = jnp.float32(jnp.inf)
    es = [jnp.full_like(o.x, inf) for _ in range(k)]
    ss = [jnp.full_like(m_sc, nsc) for _ in range(k)]
    for s in range(nsc):
        tmin, tmax = _slab(sc_b[:, s], 0, o.x, o.y, o.z, rdx, rdy, rdz)
        slack = 1e-5 * jnp.abs(tmax) + 1e-6
        entry = jnp.maximum(tmin, 0.0)
        ok = (tmax + slack >= tmin) & (tmax > -1e-6) & alive \
            & (entry <= b_t) \
            & ((entry > m_t) | ((entry == m_t) & (s > m_sc)))
        key = jnp.where(ok, entry, inf)
        # K-best insertion; ascending s keeps the earlier slot on ties.
        # es is sorted ascending, so (key < es[i]) is monotone in i —
        # shift everything at/after the insertion slot down one.
        better = [key < e for e in es]
        for i in range(k - 1, 0, -1):
            es[i] = jnp.where(better[i - 1], es[i - 1],
                              jnp.where(better[i], key, es[i]))
            ss[i] = jnp.where(better[i - 1], ss[i - 1],
                              jnp.where(better[i], s, ss[i]))
        es[0] = jnp.where(better[0], key, es[0])
        ss[0] = jnp.where(better[0], s, ss[0])
    return es, ss


def march_block_queue(ns_cols, nsc, ql):
    """Per-block superchunk queue from the (sorted) next-sc lane
    columns: the first <=ql DISTINCT wanted superchunks of each
    256-lane block, filled MULTI-LEVEL — every block's n1 run-heads
    first, then its n2 run-heads, then n3... (runs of equal keys share
    a slot; out-of-order or cross-level duplicates just waste one —
    correct either way since sweeps are idempotent). The deeper levels
    are what make the K-step advance fire: an aligned block (all lanes
    n1 == X) would otherwise carry [X, sentinels...] and no lane could
    ever advance past its first candidate in one round. `ns_cols` is a
    list of (n,) i32 columns in near-to-far order. Returns
    (queue (n_blocks*ql,) i32 with `nsc`-sentinel padding, q_ok —
    level-0 membership, kept for tests)."""
    nb = ns_cols[0].shape[0] // BN
    iota_b = jnp.arange(nb, dtype=jnp.int32)[:, None]

    def run_heads(col):
        k = col.reshape(nb, BN)
        head = jnp.concatenate(
            [jnp.ones((nb, 1), bool), k[:, 1:] != k[:, :-1]], axis=1)
        valid = head & (k < nsc)
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        return k, valid, rank, valid.astype(jnp.int32).sum(axis=1)

    def fill(queue, k, valid, slot):
        idx = jnp.where(valid & (slot < ql), iota_b * ql + slot, nb * ql)
        return queue.at[idx.reshape(-1)].set(k.reshape(-1), mode="drop")

    k1, v1, r1, c1 = run_heads(ns_cols[0])
    # base derives from k1 so the loop carry keeps shard_map vma typing
    # (CLAUDE.md: the `x * 0 + const` pattern)
    queue = k1[:, :ql].reshape(-1) * 0 + nsc
    queue = fill(queue, k1, v1, r1)
    off = c1[:, None]
    for col in ns_cols[1:]:
        kk, vv, rr, cc = run_heads(col)
        queue = fill(queue, kk, vv, off + rr)
        off = off + cc[:, None]
    q_ok = (r1 >= 0) & (r1 < ql) & (k1 < nsc)
    return queue, q_ok.reshape(-1)


def march_sweep(scene: Scene, prep: "_TracePrep", ray: Ray, active,
                b_t, b_e, queue, interpret: bool = False):
    """Dispatch one march round over the current wavefront. Returns
    (b_t, b_e, tri_tests) with the carried best merged with this
    round's sweeps. Lane count must be a BN multiple (regen guarantees
    it)."""
    n = ray.o.x.shape[0]
    assert n % BN == 0
    interpret = interpret or _FORCE_INTERPRET
    ox, oy, oz = ray.o.x, ray.o.y, ray.o.z
    dx, dy, dz = ray.d.x, ray.d.y, ray.d.z
    if active is not None:  # park dead rays (every slab fails)
        far, s3 = 1e9, 0.5773503
        ox = jnp.where(active, ox, far)
        oy = jnp.where(active, oy, far)
        oz = jnp.where(active, oz, far)
        dx = jnp.where(active, dx, s3)
        dy = jnp.where(active, dy, s3)
        dz = jnp.where(active, dz, s3)
    o4t = jnp.stack([ox, oy, oz, ox * 0 + 1.0], axis=0)
    d4t = jnp.stack([dx, dy, dz, dx * 0], axis=0)
    init2 = jnp.stack([b_t, b_e.astype(jnp.float32)], axis=0)
    nsc = prep.sc_flat.shape[0] // 8
    out = _march_step_sc(o4t, d4t, init2, queue, prep.sc_flat,
                         prep.chunk_flat, prep.m3, scc=prep.scc,
                         nsc=nsc, interpret=interpret)
    return out[0], out[1].astype(jnp.int32), out[2].astype(jnp.int32)


def march_supported(scene: Scene, prep: "_TracePrep") -> bool:
    """March needs the two-level prep and the VMEM-resident m3 (the
    march kernel keeps the whole m3 resident like the lite kernel)."""
    return bool(prep.superchunks) and _SC_LITE \
        and prep.m3.size * 4 <= _SC_RESIDENT_BYTES


def lite_epilogue(scene: Scene, prep: "_TracePrep", ray: Ray, active,
                  t, eidx):
    """Winner u/v/front/tri/inst from (t, eidx) — the lite kernels' XLA
    epilogue (one packed (N, 12) isect_cols row + 4-term dots, one
    (N, 2) tri_inst row), shared by trace_pallas's lite branch and the
    march integrator."""
    hit = t < MISS_T
    eidx = jnp.where(hit, eidx, 0)
    rows12 = scene.isect_cols[eidx]

    def dot4(c0, x, y, z, w_):
        return rows12[:, c0] * x + rows12[:, c0 + 1] * y + \
            rows12[:, c0 + 2] * z + rows12[:, c0 + 3] * w_

    ox, oy, oz = ray.o.x, ray.o.y, ray.o.z
    dx, dy, dz = ray.d.x, ray.d.y, ray.d.z
    one = ox * 0.0 + 1.0
    zero = ox * 0.0
    u = dot4(0, ox, oy, oz, one) + t * dot4(0, dx, dy, dz, zero)
    v = dot4(4, ox, oy, oz, one) + t * dot4(4, dx, dy, dz, zero)
    w_d = dot4(8, dx, dy, dz, zero)
    ti = prep.tri_inst[eidx]  # (N, 2)
    tri = jnp.where(hit, ti[:, 0], 0)
    inst = jnp.where(hit, ti[:, 1], 0)
    if active is not None:
        t = jnp.where(active, t, MISS_T)
    return HitInfo(t=t, tri=tri, inst=inst,
                   u=jnp.clip(u, 0.0, 1.0), v=jnp.clip(v, 0.0, 1.0),
                   front=w_d < 0.0, steps=t.astype(jnp.int32) * 0,
                   eidx=eidx)


class _TracePrep(NamedTuple):
    """Hoisted, kernel-ready trace inputs (build once per traced program
    via prepare_trace_inputs; cheap E-sized work)."""
    superchunks: bool
    mu: jnp.ndarray           # (4, E_pad)
    mv: jnp.ndarray
    mw: jnp.ndarray
    m3: jnp.ndarray           # (4, 3*E_pad) chunk-interleaved mu|mv|mw
    tab: jnp.ndarray          # (40, E_pad)
    chunk_flat: jnp.ndarray   # (nc_pad*8,) scalar-prefetch chunk bounds
    sc_flat: jnp.ndarray      # (nsc*8,) superchunk bounds (sc path only)
    sub_flat: jnp.ndarray     # (SUB*nc*8,) sub-chunk bounds (flat path —
    #                           phase-B any-hit refinement)
    tri_inst: jnp.ndarray     # (E, 2) i32 [tri | inst] packed rows (lite
    #                           sc epilogue fetches both in ONE row
    #                           gather — 1-D gathers run ~27 ns/elem vs
    #                           ~5 ns/row packed)
    scc: int = SCC            # effective chunks-per-superchunk this prep
    #                           was padded for (kernel calls must use the
    #                           SAME value — it sets nsc and the chunk
    #                           interleave)


def prepare_trace_inputs(scene: Scene, scc: "int | None" = None
                         ) -> "_TracePrep":
    """NOTE: the sc kernels' per-block visit queue lives in SMEM
    (~1 MB): order bytes = n_blocks × nsc × 4. With n_blocks ≤ 2048
    (512k-ray dispatches), nsc must stay ≤ ~100 — scc is raised for
    very large scenes so the queue fits (measured hard failure at
    nsc=188: 'Allocation (size=1540096) would exceed memory
    (size=1048576), space=smem')."""
    """Assemble (and pad, for the superchunk path) the kernel inputs.
    Scenes with ≤16 chunks use the flat grid (one grid step per chunk —
    fastest when the whole sweep fits a few steps); larger scenes use the
    two-level superchunk kernel."""
    e = scene.isect_mu.shape[1]
    # Integer ids (tri/inst/tex/eidx) ride the one-hot MXU fetch as f32 —
    # exact only below 2^24 expanded triangles.
    assert e < 2 ** 24, (
        f"scene has {e} expanded triangles; the packed-rows kernel carries "
        f"integer ids as f32 (exact only below 2^24). Split the scene or "
        f"use Traversal.UNIT/BVH.")
    nc = e // BT
    if scc is None:
        scc = SCC  # module global read at call time (bench --scc sweeps)
    scc = max(scc, -(-nc // 100))  # keep nsc <= ~100 (SMEM queue bound)
    tab = build_trace_table(scene)
    if nc <= 16:
        return _TracePrep(False, scene.isect_mu, scene.isect_mv,
                          scene.isect_mw,
                          _m3_layout(scene.isect_mu, scene.isect_mv,
                                     scene.isect_mw), tab,
                          _inflate_bounds(
                              scene.isect_chunk_bounds).T.reshape(-1),
                          jnp.zeros(8, jnp.float32),
                          _sub_bounds(scene),
                          jnp.stack([scene.isect_tri, scene.isect_inst],
                                    axis=1), scc)

    nc_pad = -(-nc // scc) * scc
    e_pad = nc_pad * BT

    def padr(x):
        return jnp.pad(x, ((0, 0), (0, e_pad - e)))

    mu, mv, mw = (padr(a) for a in
                  (scene.isect_mu, scene.isect_mv, scene.isect_mw))
    tab = padr(tab)

    cb = scene.isect_chunk_bounds  # (8, nc): rows 0-2 min, 3-5 max
    # Pad chunks get a point box at 1e30³ — the slab test's `tmin < cur`
    # cull rejects it for every ray (tmin ≥ ~1e20 vs cur ≤ 1e9).
    pad_box = jnp.concatenate([jnp.full((6, nc_pad - nc), 1e30, jnp.float32),
                               jnp.zeros((2, nc_pad - nc), jnp.float32)])
    cb_pad = jnp.concatenate([cb, pad_box], axis=1)

    # Superchunk bounds from REAL chunks only (pad boxes would inflate).
    nsc = nc_pad // scc
    real = (jnp.arange(nc_pad) < nc)[None, :]
    mins = jnp.where(real, cb_pad[0:3], jnp.inf).reshape(3, nsc, scc)
    maxs = jnp.where(real, cb_pad[3:6], -jnp.inf).reshape(3, nsc, scc)
    sc = jnp.concatenate([mins.min(axis=2), maxs.max(axis=2),
                          jnp.zeros((2, nsc), jnp.float32)], axis=0)
    return _TracePrep(True, mu, mv, mw, _m3_layout(mu, mv, mw), tab,
                      _inflate_bounds(cb_pad).T.reshape(-1),
                      _inflate_bounds(sc).T.reshape(-1),
                      jnp.zeros(8, jnp.float32),
                      jnp.stack([scene.isect_tri, scene.isect_inst],
                                axis=1), scc)


def trace_pallas(scene: Scene, ray: Ray, active=None,
                 interpret: bool = False, prep: "_TracePrep | None" = None
                 ) -> HitInfo:
    """HitInfo-producing wrapper over the rows kernel (pads to BN). The
    returned HitInfo carries `rows` — the packed per-winner shading/
    material/light data — so shading and NEE-MIS run gather-free
    (render/shading.py:shading_from_rows, render/lights.py). Pass a
    precomputed `prep` (prepare_trace_inputs) to hoist table/padding
    assembly out of the bounce loop. Scenes with >16 chunks dispatch to
    the two-level superchunk kernel."""
    interpret = interpret or _FORCE_INTERPRET
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN

    ox, oy, oz = ray.o.x, ray.o.y, ray.o.z
    dx, dy, dz = ray.d.x, ray.d.y, ray.d.z
    if active is not None:
        # Park dead rays far outside the scene pointing away — every chunk
        # slab test fails, so whole tiles of terminated paths are skipped.
        far, s3 = 1e9, 0.5773503
        ox = jnp.where(active, ox, far)
        oy = jnp.where(active, oy, far)
        oz = jnp.where(active, oz, far)
        dx = jnp.where(active, dx, s3)
        dy = jnp.where(active, dy, s3)
        dz = jnp.where(active, dz, s3)

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ox, 1e9), pad(oy, 1e9), pad(oz, 1e9),
                     pad(ox * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(dx, 1.0), pad(dy, 1.0), pad(dz, 1.0),
                     pad(dx * 0)], axis=0)

    if prep is None:
        prep = prepare_trace_inputs(scene)
    if prep.superchunks and _SC_LITE \
            and prep.m3.size * 4 <= _SC_RESIDENT_BYTES:
        lite = _closest_hit_sc_lite(o4t, d4t, prep.sc_flat,
                                    prep.chunk_flat, prep.m3,
                                    scc=prep.scc,
                                    interpret=interpret)[:, :n]
        # Classic gather epilogue: winner's u/v/front from ONE packed
        # (N, 12) isect_cols row + 4-term dots; tri/inst from one packed
        # (N, 2) row. Shading then uses get_shading_data_fast (rows is
        # None) — the right trade on big incoherent scenes, where the
        # kernel's per-superchunk table streaming and per-sweep rows
        # merge cost far more than these gathers.
        return lite_epilogue(scene, prep, ray, active, lite[0],
                             lite[1].astype(jnp.int32))._replace(
            steps=lite[2].astype(jnp.int32))
    if prep.superchunks:
        rows = _closest_hit_rows_sc(o4t, d4t, prep.sc_flat, prep.chunk_flat,
                                    prep.m3, prep.tab, scc=prep.scc,
                                    interpret=interpret)[:, :n]
    else:
        rows = _closest_hit_rows(o4t, d4t, scene.isect_chunk_bounds,
                                 prep.m3, prep.tab,
                                 interpret=interpret)[:, :n]

    t = rows[40]
    hit = t < MISS_T
    u = jnp.clip(rows[41], 0.0, 1.0)
    v = jnp.clip(rows[42], 0.0, 1.0)
    front = rows[43] < 0.0
    eidx = rows[44].astype(jnp.int32)
    tri = rows[15].astype(jnp.int32)
    inst = rows[16].astype(jnp.int32)
    if active is not None:
        t = jnp.where(active, t, MISS_T)
    # Row 45 counts triangles ACTUALLY swept for each ray (chunks whose
    # slab test passed × BT) — the real traversal-cost heatmap
    # (DEBUG_STEPS analog), not the constant E of round 1.
    steps = rows[45].astype(jnp.int32)
    return HitInfo(t=t, tri=tri, inst=inst, u=u, v=v,
                   front=front, steps=steps, eidx=eidx, rows=rows)


def _diff_epilogue(scene: Scene, ray: Ray, hit0: HitInfo) -> HitInfo:
    """Differentiable recompute of (t, u, v) for the primal winner
    `hit0.eidx` from the live ``scene.isect_cols`` — one contiguous
    (N, 12) gather + 4-term dots (the trace_pallas_classic epilogue).
    Shared by trace_pallas_diff and trace_occlude_pallas_diff."""
    sg = jax.lax.stop_gradient
    eidx = sg(hit0.eidx)
    is_hit = sg(hit0.t) < MISS_T

    rows = scene.isect_cols[eidx]  # (N, 12) — differentiable gather

    def dot4(m0, m1, m2, m3, x, y, z, w):
        return m0 * x + m1 * y + m2 * z + m3 * w

    one = ray.o.x * 0.0 + 1.0
    zero = ray.o.x * 0.0
    w_o = dot4(rows[:, 8], rows[:, 9], rows[:, 10], rows[:, 11],
               ray.o.x, ray.o.y, ray.o.z, one)
    w_d = dot4(rows[:, 8], rows[:, 9], rows[:, 10], rows[:, 11],
               ray.d.x, ray.d.y, ray.d.z, zero)
    inv_wd = jnp.where(jnp.abs(w_d) > _WD_EPS, w_d,
                       jnp.where(w_d < 0, -_WD_EPS, _WD_EPS))
    t = -w_o / inv_wd
    u = dot4(rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3],
             ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3],
                 ray.d.x, ray.d.y, ray.d.z, zero)
    v = dot4(rows[:, 4], rows[:, 5], rows[:, 6], rows[:, 7],
             ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(rows[:, 4], rows[:, 5], rows[:, 6], rows[:, 7],
                 ray.d.x, ray.d.y, ray.d.z, zero)

    t = jnp.where(is_hit, t, MISS_T)
    return HitInfo(t=t, tri=hit0.tri, inst=hit0.inst,
                   u=jnp.clip(u, 0.0, 1.0), v=jnp.clip(v, 0.0, 1.0),
                   front=hit0.front, steps=hit0.steps, eidx=eidx)


def trace_pallas_diff(scene: Scene, ray: Ray, active=None,
                      interpret: bool = False,
                      prep: "_TracePrep | None" = None) -> HitInfo:
    """Differentiable PALLAS traversal (VERDICT r1 item 3): the kernel runs
    as a pure primal hit-FINDER (all inputs/outputs stop-gradient'ed, so
    autodiff never touches the Pallas primitive), and the hit record
    (t, u, v, front) is RECOMPUTED differentiably from the winner's packed
    intersection columns — one contiguous (N, 12) gather — exactly the
    trace_pallas_classic epilogue. The returned HitInfo carries eidx but no
    rows, so shading takes get_shading_data_fast: live material/texture
    fetches through which ``jax.grad`` flows (albedo, emission, roughness,
    textures; geometry/camera via the recomputed t). Same primal values as
    trace_pallas up to fp-association of the recompute."""
    interpret = interpret or _FORCE_INTERPRET
    sg = jax.lax.stop_gradient
    if prep is not None:  # sg array fields; keep the python statics
        prep = prep._replace(**{k: sg(v) for k, v in
                                prep._asdict().items()
                                if k not in ("superchunks", "scc")})
    hit0 = trace_pallas(sg(scene), Ray(sg(ray.o), sg(ray.d)),
                        None if active is None else sg(active),
                        interpret=interpret, prep=prep)
    return _diff_epilogue(scene, ray, hit0)


def trace_occlude_pallas_diff(scene: Scene, ray: Ray, active,
                              sh_ray: Ray, sh_tmax, sh_active,
                              interpret: bool = False,
                              prep: "_TracePrep | None" = None):
    """Differentiable wrapper over the FUSED closest-hit + shadow-any-hit
    dispatch (VERDICT r4 item 5): the fused kernel runs as a primal
    finder on stop-gradient inputs — hard shadow visibility is detached
    anyway (zero a.e. derivative) — and the closest hit is recomputed
    differentiably via `_diff_epilogue`. Gives the differentiable
    integrator the same one-dispatch-per-bounce NEE fusion as the primal
    path instead of the separate occluded_pallas dispatch."""
    interpret = interpret or _FORCE_INTERPRET
    sg = jax.lax.stop_gradient
    if prep is not None:
        prep = prep._replace(**{k: sg(v) for k, v in
                                prep._asdict().items()
                                if k not in ("superchunks", "scc")})
    hit0, occ = trace_occlude_pallas(
        sg(scene), Ray(sg(ray.o), sg(ray.d)),
        None if active is None else sg(active),
        Ray(sg(sh_ray.o), sg(sh_ray.d)),
        sg(sh_tmax), sg(sh_active), interpret=interpret, prep=prep)
    return _diff_epilogue(scene, ray, hit0), occ


def trace_pallas_classic(scene: Scene, ray: Ray, active=None,
                         interpret: bool = False) -> HitInfo:
    """Original wrapper over the t/idx kernel + XLA gather epilogue (kept
    as a reference implementation and for the kernel's own tests)."""
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN

    ox, oy, oz = ray.o.x, ray.o.y, ray.o.z
    dx, dy, dz = ray.d.x, ray.d.y, ray.d.z
    if active is not None:
        # Park dead rays far outside the scene pointing away — every chunk
        # slab test fails, so whole tiles of terminated paths are skipped.
        far, s3 = 1e9, 0.5773503
        ox = jnp.where(active, ox, far)
        oy = jnp.where(active, oy, far)
        oz = jnp.where(active, oz, far)
        dx = jnp.where(active, dx, s3)
        dy = jnp.where(active, dy, s3)
        dz = jnp.where(active, dz, s3)

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ox, 1e9), pad(oy, 1e9), pad(oz, 1e9),
                     pad(ox * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(dx, 1.0), pad(dy, 1.0), pad(dz, 1.0),
                     pad(dx * 0)], axis=0)

    t, idx = _closest_hit(
        o4t, d4t, scene.isect_chunk_bounds,
        scene.isect_mu, scene.isect_mv, scene.isect_mw,
        interpret=interpret)
    t, idx = t[:n], idx[:n]

    # Recompute barycentrics / facing for the winning triangle only:
    # ONE contiguous 12-float row gather (isect_cols) + 4-term dots — far
    # cheaper than selecting them inside the (rays × tris) kernel sweep,
    # and row-major so the TPU gather is a contiguous 48 B fetch.
    rows = scene.isect_cols[idx]  # (N, 12)

    def dot4(m0, m1, m2, m3, x, y, z, w):
        return m0 * x + m1 * y + m2 * z + m3 * w

    one = ray.o.x * 0.0 + 1.0
    zero = ray.o.x * 0.0
    u = dot4(rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3],
             ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3],
                 ray.d.x, ray.d.y, ray.d.z, zero)
    v = dot4(rows[:, 4], rows[:, 5], rows[:, 6], rows[:, 7],
             ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(rows[:, 4], rows[:, 5], rows[:, 6], rows[:, 7],
                 ray.d.x, ray.d.y, ray.d.z, zero)
    w_d = dot4(rows[:, 8], rows[:, 9], rows[:, 10], rows[:, 11],
               ray.d.x, ray.d.y, ray.d.z, zero)
    front = w_d < 0.0

    hit = t < MISS_T
    tri = jnp.where(hit, scene.isect_tri[idx], 0)
    inst = jnp.where(hit, scene.isect_inst[idx], 0)
    if active is not None:
        t = jnp.where(active, t, MISS_T)
    steps = (ray.o.x * 0.0).astype(jnp.int32) + scene.isect_mu.shape[1]
    return HitInfo(t=t, tri=tri, inst=inst,
                   u=jnp.clip(u, 0.0, 1.0), v=jnp.clip(v, 0.0, 1.0),
                   front=front, steps=steps, eidx=idx)


def _occlusion_kernel(chunk_ref, sub_ref, ord_ref, o4_ref, d4_ref,
                      tmax_ref, m3_ref, occ_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        occ_ref[i, :] = jnp.zeros((occ_ref.shape[1],), jnp.int32)

    o4 = o4_ref[...]
    d4 = d4_ref[...]
    t_max = tmax_ref[i, :]
    occ = occ_ref[i, :]

    # Near-first visit order: occluders close to the shadow-ray origins
    # are found first, so whole blocks resolve (`occ == 0` fails) early
    # and the remaining chunks are skipped.
    nc = pl.num_programs(1)
    v = ord_ref[i * nc + j]
    cid = jnp.where(v >= nc, v - nc, v)  # sentinel decode (skip-step)

    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    rdx = 1.0 / jnp.where(jnp.abs(dx) < 1e-30, 1e-30, dx)
    rdy = 1.0 / jnp.where(jnp.abs(dy) < 1e-30, 1e-30, dy)
    rdz = 1.0 / jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)
    base = cid * 8
    tx1 = (chunk_ref[base + 0] - ox) * rdx
    tx2 = (chunk_ref[base + 3] - ox) * rdx
    ty1 = (chunk_ref[base + 1] - oy) * rdy
    ty2 = (chunk_ref[base + 4] - oy) * rdy
    tz1 = (chunk_ref[base + 2] - oz) * rdz
    tz2 = (chunk_ref[base + 5] - oz) * rdz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_max) & (occ == 0) \
        & (v < nc)

    @pl.when(jnp.any(may_hit))
    def _():
        m3 = m3_ref[...]
        bt = m3.shape[1] // 3
        sw = bt // SUB
        # Sub-chunk refinement (see _kernel_rows_nee phase B).
        for s in range(SUB):
            ssmin, ssmax = _slab(sub_ref, (cid * SUB + s) * 8,
                                 ox, oy, oz, rdx, rdy, rdz)
            occ_now = occ_ref[i, :]
            may_s = (ssmax >= ssmin) & (ssmax > 0.0) & \
                (ssmin < t_max) & (occ_now == 0)

            @pl.when(jnp.any(may_s))
            def _(s=s, occ_now=occ_now):
                mu_s = m3[:, s * sw:(s + 1) * sw]
                mv_s = m3[:, bt + s * sw:bt + (s + 1) * sw]
                mw_s = m3[:, 2 * bt + s * sw:2 * bt + (s + 1) * sw]
                w_o = _mm(o4, mw_s)
                w_d = _mm(d4, mw_s)
                wd_ok = jnp.abs(w_d) > _WD_EPS
                inv_wd = jnp.where(wd_ok, w_d, 1.0)
                t = -w_o / inv_wd
                u = _mm(o4, mu_s) + t * _mm(d4, mu_s)
                v2 = _mm(o4, mv_s) + t * _mm(d4, mv_s)
                gate = may_s.astype(jnp.int32)[:, None] > 0
                blocked = wd_ok & (t > 0.0) & (t < t_max[:, None]) & \
                    (u >= 0.0) & (v2 >= 0.0) & (u + v2 <= 1.0) & gate
                occ_ref[i, :] = occ_now | \
                    jnp.any(blocked, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occlusion(o4t, d4t, t_max, chunk_bounds, sub_flat, m3,
               interpret=False):
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    nc = e // BT
    grid = (n // BN, nc)
    gr = grid[0]
    chunk_bounds = _inflate_bounds(chunk_bounds)
    order = _block_chunk_queue(o4t, d4t, chunk_bounds,
                               tmax=t_max).reshape(-1)
    dec = _queue_decode(nc)

    def cmap(i, j, cb_ref, sub_ref, ord_ref):
        return (0, dec(ord_ref[i * nc + j]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((gr, BN), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((4, 3 * BT), cmap),
        ],
        out_specs=[pl.BlockSpec((gr, BN), lambda i, j, *_: (0, 0))],
    )
    (occ,) = pl.pallas_call(
        _occlusion_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((gr, BN), jnp.int32,
                                        vma=out_vma(o4t, d4t, m3))],
        interpret=interpret,
    )(chunk_bounds.T.reshape(-1), sub_flat, order, o4t, d4t,
      t_max.reshape(gr, BN), m3)
    return occ.reshape(-1)


def occluded_pallas(scene: Scene, ray: Ray, t_max, active=None,
                    interpret: bool = False) -> jnp.ndarray:
    """Any-hit query: True where something blocks `ray` before `t_max`.
    Cheaper than closest-hit (no argmin/record keeping; chunks skip once a
    block is fully occluded or culled; sub-chunk refinement narrows each
    taken sweep)."""
    interpret = interpret or _FORCE_INTERPRET
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN

    ox, oy, oz = ray.o.x, ray.o.y, ray.o.z
    dx, dy, dz = ray.d.x, ray.d.y, ray.d.z
    tm = t_max
    if active is not None:
        far, s3 = 1e9, 0.5773503
        ox = jnp.where(active, ox, far)
        oy = jnp.where(active, oy, far)
        oz = jnp.where(active, oz, far)
        dx = jnp.where(active, dx, s3)
        dy = jnp.where(active, dy, s3)
        dz = jnp.where(active, dz, s3)
        tm = jnp.where(active, tm, 0.0)

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ox, 1e9), pad(oy, 1e9), pad(oz, 1e9),
                     pad(ox * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(dx, 1.0), pad(dy, 1.0), pad(dz, 1.0),
                     pad(dx * 0)], axis=0)
    occ = _occlusion(o4t, d4t, pad(tm), scene.isect_chunk_bounds,
                     _sub_bounds(scene),
                     _m3_layout(scene.isect_mu, scene.isect_mv,
                                scene.isect_mw),
                     interpret=interpret)[:n]
    out = occ.astype(bool)
    if active is not None:
        out = out & active
    return out


# ---------------------------------------------------------------------------
# Soft-shadow (top-1 blocker) kernel: per shadow ray, find the triangle
# with the MAXIMUM barycentric edge margin among all triangles whose plane
# the ray crosses inside (0, t_max) — near-misses (negative margin)
# included. The differentiable wrapper recomputes that winner's coverage
# sigmoid(margin/eps) from the live isect_cols, so silhouette gradients
# w.r.t. blocker geometry flow through the PALLAS path (BASELINE config 4;
# BRUTE/UNIT keep the exact all-triangle product, intersect.occlusion_soft
# — this kernel is its top-1 approximation: equal whenever one blocker
# dominates the band, and both saturate to 0 visibility off the band).
# ---------------------------------------------------------------------------


def _soft_occlusion_kernel(chunk_ref, ord_ref, o4_ref, d4_ref, tmax_ref,
                           m3_ref, eo_ref, marg_ref, idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        marg_ref[i, :] = jnp.full((marg_ref.shape[1],), -1e9, jnp.float32)
        idx_ref[i, :] = jnp.zeros((idx_ref.shape[1],), jnp.int32)

    o4 = o4_ref[...]
    d4 = d4_ref[...]
    t_max = tmax_ref[i, :]
    cur = marg_ref[i, :]

    nc = pl.num_programs(1)
    qv = ord_ref[i * nc + j]
    cid = jnp.where(qv >= nc, qv - nc, qv)  # sentinel decode (skip-step)

    ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
    dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
    tmin, tmax = _slab(chunk_ref, cid * 8, ox, oy, oz,
                       _rcp(dx), _rcp(dy), _rcp(dz))
    # No `occ` early-out (a max cannot resolve early); the slab test is
    # conservative for the in-range triangles of this chunk (a near-miss
    # point lies within ~eps·edge of the triangle, i.e. essentially inside
    # the chunk AABB the triangle is contained in — and the wrapper
    # inflates the bounds by the near-miss band width).
    may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_max) & (qv < nc)

    @pl.when(jnp.any(may_hit))
    def _():
        m3 = m3_ref[...]
        u_o, v_o, w_o = _uvw(o4, m3)
        u_d, v_d, w_d = _uvw(d4, m3)
        wd_ok = jnp.abs(w_d) > _WD_EPS
        inv_wd = jnp.where(wd_ok, w_d, 1.0)
        t = -w_o / inv_wd
        u = u_o + t * u_d
        v = v_o + t * v_d
        w_ = 1.0 - u - v
        # Openness-gated margin: only OPEN edges soften; a crossing past
        # an interior edge gates hard (the neighbor triangle covers it).
        eo = eo_ref[...]
        ou, ov, ow = eo[0][None, :], eo[1][None, :], eo[2][None, :]
        m_open = jnp.minimum(
            jnp.minimum(jnp.where(ou > 0, u, 1.0),
                        jnp.where(ov > 0, v, 1.0)),
            jnp.where(ow > 0, w_, 1.0))
        int_ok = jnp.minimum(
            jnp.minimum(jnp.where(ou > 0, 1.0, u),
                        jnp.where(ov > 0, 1.0, v)),
            jnp.where(ow > 0, 1.0, w_)) > 0.0
        in_t = wd_ok & (t > 1e-6) & (t < t_max[:, None]) & int_ok
        m = jnp.where(in_t, m_open, -1e9)
        mk = jnp.max(m, axis=1)                       # (BN,)
        # Lexicographic (margin, eidx) winner — visit-order independent
        # (same rationale as _sweep_update's tie rule).
        better0 = (mk > cur) & may_hit
        tie = (mk == cur) & (mk > -1e8) & may_hit

        @pl.when(jnp.any(better0 | tie))
        def _():
            bt = m.shape[1]
            k = jnp.argmax(m, axis=1).astype(jnp.int32)
            better = better0 | (tie & (cid * bt + k < idx_ref[i, :]))
            marg_ref[i, :] = jnp.where(better, mk, cur)
            idx_ref[i, :] = jnp.where(better, cid * bt + k, idx_ref[i, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _soft_occlusion(o4t, d4t, t_max, chunk_bounds, m3, eo4,
                    interpret=False):
    n = o4t.shape[1]
    e = m3.shape[1] // 3
    nc = e // BT
    grid = (n // BN, nc)
    gr = grid[0]
    order = _block_chunk_queue(o4t, d4t, chunk_bounds,
                               tmax=t_max).reshape(-1)
    dec = _queue_decode(nc)

    def cmap(i, j, cb_ref, ord_ref):
        return (0, dec(ord_ref[i * nc + j]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, j, *_: (0, i)),
            pl.BlockSpec((gr, BN), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((4, 3 * BT), cmap),
            pl.BlockSpec((4, BT), cmap),
        ],
        out_specs=[pl.BlockSpec((gr, BN), lambda i, j, *_: (0, 0))
                   for _ in range(2)],
    )
    marg, idx = pl.pallas_call(
        _soft_occlusion_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((gr, BN), jnp.float32,
                                        vma=out_vma(o4t, d4t, m3)),
                   jax.ShapeDtypeStruct((gr, BN), jnp.int32,
                                        vma=out_vma(o4t, d4t, m3))],
        interpret=interpret,
    )(chunk_bounds.T.reshape(-1), order, o4t, d4t, t_max.reshape(gr, BN),
      m3, eo4)
    return marg.reshape(-1), idx.reshape(-1)


def soft_occluded_pallas(scene: Scene, ray: Ray, t_max, active=None,
                         edge_eps: float = 2e-2,
                         interpret: bool = False) -> jnp.ndarray:
    """Differentiable soft visibility in [0, 1] for shadow rays through
    the PALLAS path: the kernel (a pure primal finder on stop-gradient
    inputs) locates the maximum-coverage blocker candidate; its coverage
    is recomputed differentiably from the live ``scene.isect_cols`` rows,
    so ``jax.grad`` flows to blocker vertices / instance poses exactly as
    in intersect.occlusion_soft (top-1 blocker instead of the all-triangle
    product — see _soft_occlusion_kernel)."""
    interpret = interpret or _FORCE_INTERPRET
    sg = jax.lax.stop_gradient
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN

    ox, oy, oz = sg(ray.o.x), sg(ray.o.y), sg(ray.o.z)
    dx, dy, dz = sg(ray.d.x), sg(ray.d.y), sg(ray.d.z)
    tm = sg(t_max)
    if active is not None:
        far, s3 = 1e9, 0.5773503
        ox = jnp.where(active, ox, far)
        oy = jnp.where(active, oy, far)
        oz = jnp.where(active, oz, far)
        dx = jnp.where(active, dx, s3)
        dy = jnp.where(active, dy, s3)
        dz = jnp.where(active, dz, s3)
        tm = jnp.where(active, tm, 0.0)

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ox, 1e9), pad(oy, 1e9), pad(oz, 1e9),
                     pad(ox * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(dx, 1.0), pad(dy, 1.0), pad(dz, 1.0),
                     pad(dx * 0)], axis=0)
    # Per-expanded-triangle edge openness, (4, E): rows u/v/w + pad.
    eo_n = sg(scene.tri_edge_open)[sg(scene.isect_tri)]  # (E, 3)
    eo4 = jnp.concatenate(
        [eo_n.T, jnp.zeros((1, eo_n.shape[0]), jnp.float32)], axis=0)
    # Inflate the chunk slabs by ~the width of the near-miss band
    # (margin within a few edge_eps of zero ≈ edge_eps × edge length in
    # world units; edge length bounded by the chunk diagonal): a blocker
    # candidate whose triangle sits in a chunk AABB the ray narrowly
    # misses must still be swept, or penumbra coverage and silhouette
    # gradients clip to zero exactly at chunk-AABB boundaries (a dead
    # gradient band that can stall optimization when the blocker edge
    # lies near a chunk face). Conservative only — extra chunks swept,
    # same winner.
    cb = sg(scene.isect_chunk_bounds)
    diag = jnp.sqrt(jnp.maximum(
        ((cb[3:6] - cb[0:3]) ** 2).sum(axis=0), 0.0))  # (nc,)
    infl = (edge_eps * diag)[None, :]
    cb = jnp.concatenate([cb[0:3] - infl, cb[3:6] + infl, cb[6:8]], axis=0)
    marg0, eidx = _soft_occlusion(
        o4t, d4t, pad(tm), cb,
        _m3_layout(sg(scene.isect_mu), sg(scene.isect_mv),
                   sg(scene.isect_mw)), eo4,
        interpret=interpret)
    marg0, eidx = marg0[:n], eidx[:n]
    found = marg0 > -1e8

    # Differentiable recompute of the winner's coverage (the same
    # plane-intersection epilogue as trace_pallas_diff).
    rows = scene.isect_cols[eidx]  # (N, 12)
    one = ray.o.x * 0.0 + 1.0
    zero = ray.o.x * 0.0

    def dot4(c0, x, y, z, w_):
        return rows[:, c0] * x + rows[:, c0 + 1] * y + \
            rows[:, c0 + 2] * z + rows[:, c0 + 3] * w_

    w_o = dot4(8, ray.o.x, ray.o.y, ray.o.z, one)
    w_d = dot4(8, ray.d.x, ray.d.y, ray.d.z, zero)
    inv_wd = jnp.where(jnp.abs(w_d) > _WD_EPS, w_d,
                       jnp.where(w_d < 0, -_WD_EPS, _WD_EPS))
    t = -w_o / inv_wd
    u = dot4(0, ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(0, ray.d.x, ray.d.y, ray.d.z, zero)
    v = dot4(4, ray.o.x, ray.o.y, ray.o.z, one) + \
        t * dot4(4, ray.d.x, ray.d.y, ray.d.z, zero)
    w_ = 1.0 - u - v
    eo_w = eo_n[eidx]  # (N, 3) — detached gates; same as the kernel's
    m_open = jnp.minimum(
        jnp.minimum(jnp.where(eo_w[:, 0] > 0, u, 1.0),
                    jnp.where(eo_w[:, 1] > 0, v, 1.0)),
        jnp.where(eo_w[:, 2] > 0, w_, 1.0))
    int_ok = jnp.minimum(
        jnp.minimum(jnp.where(eo_w[:, 0] > 0, 1.0, u),
                    jnp.where(eo_w[:, 1] > 0, 1.0, v)),
        jnp.where(eo_w[:, 2] > 0, 1.0, w_)) > 0.0
    in_t = sg((jnp.abs(w_d) > _WD_EPS) & (t > 1e-6) & (t < t_max)
              & int_ok)
    cov = jax.nn.sigmoid(m_open / edge_eps)
    cov = jnp.where(found & in_t, cov, 0.0)
    vis = 1.0 - cov
    if active is not None:
        vis = jnp.where(active, vis, 1.0)
    return vis


# ---------------------------------------------------------------------------
# Experimental: in-kernel chunk-loop closest hit (fori + cond sweep shared
# with the fused megakernel). Transfer-verified on TPU: matches the
# grid-step kernel (99.9999% of rays) but is ~2.8x SLOWER on coherent
# 1080p camera rays (taken-branch lowering cost) — kept for reference and
# for sparse/incoherent workloads where its skips win.
# ---------------------------------------------------------------------------

def _kernel_loop(chunk_ref, o4_ref, d4_ref, mu_ref, mv_ref, mw_ref,
                 t_ref, idx_ref, *, n_chunks):
    from gdpathtracing_tpu.ops.fused_pallas import _sweep
    i = pl.program_id(0)
    ox, oy, oz = o4_ref[0, :], o4_ref[1, :], o4_ref[2, :]
    dx, dy, dz = d4_ref[0, :], d4_ref[1, :], d4_ref[2, :]
    active = jnp.ones((BN,), bool)
    t, eidx = _sweep(chunk_ref, mu_ref, mv_ref, mw_ref, n_chunks,
                     ox, oy, oz, dx, dy, dz, active)
    t_ref[i, :] = t
    idx_ref[i, :] = eidx


@functools.partial(jax.jit, static_argnames=("interpret",))
def _closest_hit_loop(o4t, d4t, chunk_bounds, mu, mv, mw, interpret=False):
    n = o4t.shape[1]
    e = mu.shape[1]
    n_chunks = e // BT
    gr = n // BN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gr,),
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, *_: (0, i)),
            pl.BlockSpec((4, e), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, e), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, e), lambda i, *_: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((gr, BN), lambda i, *_: (0, 0))
                   for _ in range(2)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_loop, n_chunks=n_chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gr, BN), jnp.float32,
                                 vma=out_vma(o4t, d4t, mu)),
            jax.ShapeDtypeStruct((gr, BN), jnp.int32,
                                 vma=out_vma(o4t, d4t, mu)),
        ],
        interpret=interpret,
    )(chunk_bounds.T.reshape(-1), o4t, d4t, mu, mv, mw)
    t, idx = (a.reshape(-1) for a in out)
    return t, idx
