"""Per-bounce path-tracing megakernel (megakernel v2).

Round-1 profiling showed the frame was NOT kernel-bound: the rows kernel
sweeps 256k coherent rays in ~2.3 ms, yet a 1080p bounce-tile cost ~12 ms —
the rest was per-bounce XLA glue (dozens of small elementwise kernels over
(N,) wavefront rows, each paying launch + HBM round-trip). This module
moves the ENTIRE bounce — closest-hit sweep, winner-row fetch, shading,
NEE light sampling + shadow-ray occlusion, MIS, BRDF sampling, RNG — into
ONE Pallas kernel per bounce, so per-ray state crosses HBM once per bounce
as a packed (24, N)+(8, N) state matrix instead of ~40 separate arrays.

Functional target: the reference's whole per-pixel program
(main.glsl:372-436), re-shaped for the TPU:

- grid = (ray_blocks, sweep_steps): sweep_steps = nc chunk sweeps for the
  path rays, plus nc shadow (any-hit) sweeps when NEE is on. The ray
  block's state is VMEM-resident across all steps (Pallas revisiting rule);
  chunk geometry/table data streams through as (4, BT)/(40, BT) blocks.
- STRAIGHT-LINE bodies under pl.when only — no in-kernel fori_loop/cond,
  which fault this toolchain's TPU worker (docs/RUNTIME_BUG.md).
- The epilogue (shading/BRDF/RNG) runs at the last grid step, reusing the
  same jnp brdf/sky modules as the wavefront integrator and the same PCG2D
  stream → images match Traversal.UNIT/PALLAS to f32 tolerance.
- The NEE shadow ray of bounce k is built at the end of the closest-hit
  phase (epilogue A) and resolved by the nc any-hit steps of phase B in the
  SAME kernel — shadow rays share the dispatch and the streamed chunk data
  with the path rays instead of paying a second full dispatch
  (round-1 `occluded_pallas` cost ~2x the frame; VERDICT item 4).

Scope guard (`mega_supported`): no textures / env map / transmission
(texture gathers don't fit the in-kernel model — those scenes use the
wavefront PALLAS path), flat chunk list (nc <= 16, i.e. E <= 4096), and an
in-VMEM light table (n_lights <= 4096).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdpathtracing_tpu.config import RenderConfig
from gdpathtracing_tpu.core.vec import Vec3, where as vwhere
from gdpathtracing_tpu.ops.intersect_pallas import (BN, BT, OUT_R, TAB_R,
                                                    _MISS, _rcp, _slab,
                                                    _sweep_update, out_vma,
                                                    prepare_trace_inputs)
from gdpathtracing_tpu.render import brdf
from gdpathtracing_tpu.render.lights import build_light_table
from gdpathtracing_tpu.render.shading import MIN_ROUGHNESS
from gdpathtracing_tpu.render.sky import sample_sky
from gdpathtracing_tpu.render.types import ShadingInfo
from gdpathtracing_tpu.scene.scene import Scene

_FORCE_INTERPRET = False  # test hook (CPU interpret mode)

FS_R = 24  # f32 state rows: 0:3 o | 3:6 d | 6:9 throughput | 9:12 radiance
#            | 12 active | 13 depth | 14 prev_pdf | 15:18 first normal | pad
IS_R = 8   # i32 state rows: 0 seed_x | 1 seed_y | 2 steps | 3 segments | pad
LT_R = 24  # light-table rows: 0:17 = lights.LightTable.rows.T | 17 cdf | pad

MAX_MEGA_CHUNKS = 16
MAX_MEGA_LIGHTS = 4096
_PARK = 1e9
_PARK_D = 0.5773503


def _pcg2d_i32(sx, sy):
    """In-kernel PCG2D on int32-carried bit patterns (same stream as
    core.rng.pcg2d): int32 add/mul/xor wrap identically to uint32 (modular
    two's complement); the only op that differs is the shift, made logical
    explicitly. No bitcasts — Mosaic's bitcast rejects 1-D vectors."""
    a = jnp.int32(1664525)
    c = jnp.int32(1013904223)
    srl = jax.lax.shift_right_logical
    sx = sx * a + c
    sy = sy * a + c
    sx = sx + sy * a
    sy = sy + sx * a
    sx = sx ^ srl(sx, 16)
    sy = sy ^ srl(sy, 16)
    sx = sx + sy * a
    sy = sy + sx * a
    sx = sx ^ srl(sx, 16)
    sy = sy ^ srl(sy, 16)

    def to_f32(w):
        # hi/lo split: exact uint32→f32 up to the single final rounding —
        # bit-identical to XLA's convert (parity with core.rng.pcg2d).
        hi = srl(w, 16).astype(jnp.float32)
        lo = (w & jnp.int32(0xFFFF)).astype(jnp.float32)
        return hi * 65536.0 + lo

    u = to_f32(sx) * jnp.float32(2.32830643654e-10)
    v = to_f32(sy) * jnp.float32(2.32830643654e-10)
    return (u, v), (sx, sy)


def mega_supported(scene: Scene, config: RenderConfig) -> bool:
    nc = int(jnp.shape(scene.isect_mu)[1]) // BT
    return (not scene.has_env and not scene.has_transmission
            and not scene.has_textures and not scene.has_mr_textures
            and nc <= MAX_MEGA_CHUNKS
            and scene.n_lights <= MAX_MEGA_LIGHTS
            and config.soft_shadows == 0.0)


def _shade_rows(rows, u, v, front, o: Vec3, d: Vec3, t) -> ShadingInfo:
    """shading_from_rows (render/shading.py) on the resident acc block —
    same math, no Scene object (mega excludes textured scenes)."""
    w = 1.0 - u - v
    normal = Vec3(
        rows[0] * w + rows[3] * u + rows[6] * v,
        rows[1] * w + rows[4] * u + rows[7] * v,
        rows[2] * w + rows[5] * u + rows[8] * v,
    ).normalize(eps=1e-20)
    normal = vwhere(front, normal, -normal)
    albedo = Vec3(rows[17], rows[18], rows[19])
    energy = jnp.maximum(0.0, rows[23])
    emission = Vec3(rows[20] * energy, rows[21] * energy, rows[22] * energy)
    metallic = rows[24]
    roughness = jnp.maximum(MIN_ROUGHNESS, rows[25])
    position = o + d * t
    out_dir = -d
    f0 = Vec3.full(0.02, like=albedo) + \
        (albedo - Vec3.full(0.02, like=albedo)) * metallic
    return ShadingInfo(
        position=position, normal=normal, out_dir=out_dir,
        lambert_out=normal.dot(out_dir), emission=emission,
        diffuse_albedo=albedo - albedo * metallic, fresnel_0=f0,
        roughness=roughness, transmission=rows[27], ior=rows[28],
        albedo=albedo)


def _sample_light_block(lt, position: Vec3, n_lights: int, r_pick, r1, r2):
    """lights.sample_light against the resident (LT_R, L_pad) light block:
    compare-all searchsorted + one-hot MXU row fetch (bit-identical values
    to the XLA path — a one-hot matmul of exact rows is exact)."""
    cdf = lt[17, :]  # padded with 2.0 → pad slots never selected
    l = jnp.sum((cdf[None, :] < r_pick[:, None]).astype(jnp.int32), axis=1)
    l = jnp.clip(l, 0, n_lights - 1)
    bn, lp = r_pick.shape[0], cdf.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (bn, lp), 1)
              == l[:, None]).astype(jnp.float32)
    r = jax.lax.dot_general(
        lt, onehot, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (LT_R, BN)
    v0 = Vec3(r[0], r[1], r[2])
    e1 = Vec3(r[3], r[4], r[5])
    e2 = Vec3(r[6], r[7], r[8])
    normal = Vec3(r[9], r[10], r[11])
    emission = Vec3(r[12], r[13], r[14])
    area, pick = r[15], r[16]

    su = jnp.sqrt(r1)
    b1 = r2 * su
    b2 = su * (1.0 - r2)
    point = v0 + e1 * b1 + e2 * b2
    delta = point - position
    dist2 = jnp.maximum(delta.length_sq(), 1e-8)
    dist = jnp.sqrt(dist2)
    wi = delta * (1.0 / dist)
    cos_l = jnp.abs(normal.dot(-wi))
    pdf_solid = dist2 / jnp.maximum(cos_l * area, 1e-8) * pick
    pdf_solid = jnp.where(cos_l > 1e-6, pdf_solid, jnp.inf)
    return point, normal, emission, pdf_solid, wi, dist


def _light_pdf_rows(rows, d: Vec3, t):
    """lights.light_pdf_from_rows on the resident acc block."""
    inv_term = rows[30]
    cos_l = jnp.abs(rows[31] * d.x + rows[32] * d.y + rows[33] * d.z)
    dist2 = jnp.maximum(t * t, 1e-8)
    pdf = dist2 * inv_term / jnp.maximum(cos_l, 1e-6)
    return jnp.where((inv_term > 0.0) & (cos_l > 1e-6), pdf, 0.0)


def _make_mega_kernel(config: RenderConfig, nc: int, n_lights: int):
    nee = config.nee and n_lights > 0
    nsteps = 2 * nc if nee else nc
    ray_eps = config.ray_eps

    def kernel(*refs):
        if nee:
            (chunk_ref, meta_ref, ord_ref, fs_ref, is_ref, mu_ref, mv_ref,
             mw_ref, tab_ref, lt_ref, ofs_ref, ois_ref,
             acc_ref, o4s, d4s, sho4, shd4, shm) = refs
        else:
            (chunk_ref, meta_ref, ord_ref, fs_ref, is_ref, mu_ref, mv_ref,
             mw_ref, tab_ref, ofs_ref, ois_ref, acc_ref, o4s, d4s) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            fs = fs_ref[...]
            act = fs[12, :] > 0.0
            # Park dead rays outside the scene so chunk culling skips
            # whole terminated blocks (the TPU "early thread exit").
            o4s[0, :] = jnp.where(act, fs[0, :], _PARK)
            o4s[1, :] = jnp.where(act, fs[1, :], _PARK)
            o4s[2, :] = jnp.where(act, fs[2, :], _PARK)
            o4s[3, :] = jnp.ones_like(fs[0, :])
            d4s[0, :] = jnp.where(act, fs[3, :], _PARK_D)
            d4s[1, :] = jnp.where(act, fs[4, :], _PARK_D)
            d4s[2, :] = jnp.where(act, fs[5, :], _PARK_D)
            d4s[3, :] = jnp.zeros_like(fs[0, :])
            acc_ref[...] = jnp.zeros((OUT_R, acc_ref.shape[1]), jnp.float32)
            acc_ref[40, :] = jnp.full((acc_ref.shape[1],), _MISS,
                                      jnp.float32)

        # ---- Phase A: closest-hit sweep (front-to-back: this block's
        # j-th NEAREST chunk, same indirection as _kernel_rows) ----
        @pl.when(j < nc)
        def _():
            cid = ord_ref[i * nc + j]
            o4 = o4s[...]
            d4 = d4s[...]
            ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
            dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
            cur = acc_ref[40, :]
            tmin, tmax = _slab(chunk_ref, cid * 8, ox, oy, oz,
                               _rcp(dx), _rcp(dy), _rcp(dz))
            may = (tmax >= tmin) & (tmax > 0.0) & (tmin <= cur)

            @pl.when(jnp.any(may))
            def _():
                acc_ref[45, :] = acc_ref[45, :] + \
                    jnp.where(may, float(BT), 0.0)
                # _sweep_update takes the chunk-interleaved (4, 3*BT)
                # layout since the m3 rework; MEGA still streams mu/mv/mw
                # separately, so join them here (VMEM values — register
                # shuffles, the matmul results are element-identical).
                # `may` gates the merge per ray (composition-independent
                # winners, same contract as the wavefront kernels).
                _sweep_update(acc_ref, o4, d4,
                              jnp.concatenate([mu_ref[...], mv_ref[...],
                                               mw_ref[...]], axis=1),
                              tab_ref[...], cid * BT, may)

        if nee:
            def _epilogue_a(fs, act):
                rows = acc_ref[...]
                t = rows[40]
                hit = (t < _MISS) & act
                u = jnp.clip(rows[41], 0.0, 1.0)
                v = jnp.clip(rows[42], 0.0, 1.0)
                front = rows[43] < 0.0
                o = Vec3(fs[0], fs[1], fs[2])
                d = Vec3(fs[3], fs[4], fs[5])
                s = _shade_rows(rows, u, v, front, o, d, t)
                iv = is_ref[...]
                (lr1, lr2), sd = _pcg2d_i32(iv[0, :], iv[1, :])
                (lr3, _), _ = _pcg2d_i32(*sd)
                _, _, _, pdf_solid, wi, dist = _sample_light_block(
                    lt_ref[...], s.position, n_lights, lr3, lr1, lr2)
                cos_i = s.normal.dot(wi)
                sh_act = hit & (cos_i > 0.0) & jnp.isfinite(pdf_solid)
                so = s.position + s.normal * ray_eps
                sho4[0, :] = jnp.where(sh_act, so.x, _PARK)
                sho4[1, :] = jnp.where(sh_act, so.y, _PARK)
                sho4[2, :] = jnp.where(sh_act, so.z, _PARK)
                sho4[3, :] = jnp.ones_like(so.x)
                shd4[0, :] = jnp.where(sh_act, wi.x, _PARK_D)
                shd4[1, :] = jnp.where(sh_act, wi.y, _PARK_D)
                shd4[2, :] = jnp.where(sh_act, wi.z, _PARK_D)
                shd4[3, :] = jnp.zeros_like(so.x)
                shm[0, :] = jnp.where(sh_act, dist * (1.0 - 1e-3), 0.0)
                shm[1, :] = jnp.zeros_like(so.x)  # occluded accumulator

            # ---- Epilogue A (last closest-hit step): build shadow rays ----
            @pl.when(j == nc - 1)
            def _():
                fs = fs_ref[...]
                act = fs[12, :] > 0.0
                any_act = jnp.any(act)

                # All-dead block (stream compaction parks terminated rays
                # in tail blocks): skip the shading/light math, just park
                # the shadow rays so phase B's slab tests all fail.
                @pl.when(~any_act)
                def _():
                    ones = jnp.ones((sho4.shape[1],), jnp.float32)
                    sho4[0, :] = ones * _PARK
                    sho4[1, :] = ones * _PARK
                    sho4[2, :] = ones * _PARK
                    sho4[3, :] = ones
                    shd4[0, :] = ones * _PARK_D
                    shd4[1, :] = ones * _PARK_D
                    shd4[2, :] = ones * _PARK_D
                    shd4[3, :] = ones * 0.0
                    shm[...] = jnp.zeros(shm.shape, jnp.float32)

                @pl.when(any_act)
                def _():
                    _epilogue_a(fs, act)

            # ---- Phase B: any-hit sweep of the block's (j - nc)-th
            # nearest chunk over the shadow rays (near-first order finds
            # occluders sooner → more whole-block early exits) ----
            @pl.when(j >= nc)
            def _():
                cid = ord_ref[i * nc + (j - nc)]
                o4 = sho4[...]
                d4 = shd4[...]
                ox, oy, oz = o4[0, :], o4[1, :], o4[2, :]
                dx, dy, dz = d4[0, :], d4[1, :], d4[2, :]
                t_max = shm[0, :]
                occ = shm[1, :]
                tmin, tmax = _slab(chunk_ref, cid * 8, ox, oy, oz,
                                   _rcp(dx), _rcp(dy), _rcp(dz))
                may = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_max) & \
                    (occ < 0.5)

                @pl.when(jnp.any(may))
                def _():
                    def mm(a, b):
                        return jax.lax.dot_general(
                            a, b, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)

                    mu, mv, mw = mu_ref[...], mv_ref[...], mw_ref[...]
                    u_o, v_o, w_o = mm(o4, mu), mm(o4, mv), mm(o4, mw)
                    u_d, v_d, w_d = mm(d4, mu), mm(d4, mv), mm(d4, mw)
                    wd_ok = jnp.abs(w_d) > 1e-12
                    inv_wd = jnp.where(wd_ok, w_d, 1.0)
                    tt = -w_o / inv_wd
                    uu = u_o + tt * u_d
                    vv = v_o + tt * v_d
                    blocked = wd_ok & (tt > 0.0) & (tt < t_max[:, None]) & \
                        (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    shm[1, :] = jnp.maximum(
                        occ, jnp.any(blocked, axis=1).astype(jnp.float32))

        # ---- Epilogue B (last step): shade, NEE, sample, write state ----
        def _epilogue_b(fs, iv, act):
            rows = acc_ref[...]
            sx, sy = iv[0, :], iv[1, :]
            t = rows[40]
            hit = (t < _MISS) & act
            u = jnp.clip(rows[41], 0.0, 1.0)
            v = jnp.clip(rows[42], 0.0, 1.0)
            front = rows[43] < 0.0
            o = Vec3(fs[0], fs[1], fs[2])
            d = Vec3(fs[3], fs[4], fs[5])
            tp = Vec3(fs[6], fs[7], fs[8])
            rad = Vec3(fs[9], fs[10], fs[11])
            prev_pdf = fs[14]
            s = _shade_rows(rows, u, v, front, o, d, t)

            sky = sample_sky(d, config)
            emission = vwhere(hit, s.emission, sky)
            if nee:
                pl_pdf = _light_pdf_rows(rows, d, t)
                pb = jnp.maximum(prev_pdf, 0.0)
                w_mis = jnp.where(
                    (prev_pdf > 0.0) & hit & (pl_pdf > 0.0),
                    (pb * pb) / jnp.maximum(pb * pb + pl_pdf * pl_pdf,
                                            1e-20), 1.0)
                emission = emission * w_mis
            rad = vwhere(act, rad + tp * emission, rad)
            segs_add = act.astype(jnp.int32)

            if nee:
                # Re-derive the light sample deterministically (same seed
                # → same draws as epilogue A; cheaper than persisting it).
                (lr1, lr2), sd = _pcg2d_i32(sx, sy)
                (lr3, _), (sx, sy) = _pcg2d_i32(*sd)
                _, _, l_emission, pdf_solid, wi, _ = _sample_light_block(
                    lt_ref[...], s.position, n_lights, lr3, lr1, lr2)
                cos_i = s.normal.dot(wi)
                sh_act = hit & (cos_i > 0.0) & jnp.isfinite(pdf_solid)
                visibility = (1.0 - shm[1, :])
                segs_add = segs_add + sh_act.astype(jnp.int32)
                f_l = brdf.eval_brdf(s, wi)
                pb_l = brdf.brdf_pdf(s, wi)
                w_l = (pdf_solid * pdf_solid) / jnp.maximum(
                    pdf_solid * pdf_solid + pb_l * pb_l, 1e-20)
                scale_l = jnp.where(
                    sh_act & (pdf_solid > 1e-12) & jnp.isfinite(pdf_solid),
                    cos_i * w_l / jnp.maximum(pdf_solid, 1e-12),
                    0.0) * visibility
                direct = tp * f_l * l_emission * scale_l
                rad = vwhere(act, rad + direct, rad)

            bounce = meta_ref[0]
            dist = (s.position - o).length()
            first = (bounce == 0) & hit
            depth = jnp.where(first, dist, fs[13])
            n0 = vwhere(first, s.normal, Vec3(fs[15], fs[16], fs[17]))

            (r1, r2), (sx, sy) = _pcg2d_i32(sx, sy)
            new_dir = brdf.sample_brdf(s, r1, r2)
            pdf = brdf.brdf_pdf(s, new_dir)
            lambert_in = s.normal.dot(new_dir)
            f = brdf.eval_brdf(s, new_dir)
            scale = jnp.where(pdf > 1e-12,
                              lambert_in / jnp.maximum(pdf, 1e-12), 0.0)
            mult = f * scale
            survive = hit & (lambert_in > 0.0) & (pdf > 1e-12)

            if config.rr_start > 0:
                # Russian roulette, same stream as the integrator: the
                # draw is unconditional whenever rr_start > 0 (Python-
                # level gate), the kill is applied from bounce rr_start
                # on (render/integrator.py RR block).
                (r5, _), (sx, sy) = _pcg2d_i32(sx, sy)
                ntx = tp.x * mult.x
                nty = tp.y * mult.y
                ntz = tp.z * mult.z
                lum = jnp.maximum(ntx, jnp.maximum(nty, ntz))
                p = jnp.clip(lum, config.rr_min_p, 1.0)
                do_rr = bounce >= config.rr_start
                survive = survive & jnp.where(do_rr, r5 < p, True)
                boost = jnp.where(do_rr, 1.0 / p, 1.0)
                mult = mult * boost

            new_o = s.position + s.normal * ray_eps

            ofs_ref[0, :] = jnp.where(survive, new_o.x, fs[0])
            ofs_ref[1, :] = jnp.where(survive, new_o.y, fs[1])
            ofs_ref[2, :] = jnp.where(survive, new_o.z, fs[2])
            ofs_ref[3, :] = jnp.where(survive, new_dir.x, fs[3])
            ofs_ref[4, :] = jnp.where(survive, new_dir.y, fs[4])
            ofs_ref[5, :] = jnp.where(survive, new_dir.z, fs[5])
            ofs_ref[6, :] = jnp.where(survive, tp.x * mult.x, fs[6])
            ofs_ref[7, :] = jnp.where(survive, tp.y * mult.y, fs[7])
            ofs_ref[8, :] = jnp.where(survive, tp.z * mult.z, fs[8])
            ofs_ref[9, :] = rad.x
            ofs_ref[10, :] = rad.y
            ofs_ref[11, :] = rad.z
            ofs_ref[12, :] = survive.astype(jnp.float32)
            ofs_ref[13, :] = depth
            ofs_ref[14, :] = jnp.where(survive, pdf, -1.0)
            ofs_ref[15, :] = n0.x
            ofs_ref[16, :] = n0.y
            ofs_ref[17, :] = n0.z
            for r_ in range(18, FS_R):
                ofs_ref[r_, :] = fs[r_]

            ois_ref[0, :] = sx
            ois_ref[1, :] = sy
            ois_ref[2, :] = iv[2, :] + jnp.where(
                act, rows[45].astype(jnp.int32), 0)
            ois_ref[3, :] = iv[3, :] + segs_add
            for r_ in range(4, IS_R):
                ois_ref[r_, :] = iv[r_]

        @pl.when(j == nsteps - 1)
        def _():
            fs = fs_ref[...]
            iv = is_ref[...]
            act = fs[12, :] > 0.0
            any_act = jnp.any(act)

            # All-dead block (stream compaction): state passes through
            # unchanged — a terminated ray's epilogue is the identity
            # (survive stays false, radiance/depth/normal/steps/segments
            # unchanged, and its RNG draws are never consumed again).
            @pl.when(~any_act)
            def _():
                ofs_ref[...] = fs
                ois_ref[...] = iv

            @pl.when(any_act)
            def _():
                _epilogue_b(fs, iv, act)

    return kernel, nsteps, nee


@functools.partial(jax.jit, static_argnames=("config", "nc", "n_lights",
                                              "interpret"))
def _mega_step(chunk_flat, meta, order, fstate, istate, mu, mv, mw, tab, lt,
               config: RenderConfig, nc: int, n_lights: int,
               interpret=False):
    """One bounce over the whole wavefront: (24, N)+(8, N) state in/out.
    `order` = flattened (n_blocks, nc) per-block near-to-far chunk visit
    order (see intersect_pallas._block_chunk_order)."""
    n = fstate.shape[1]
    kernel, nsteps, nee = _make_mega_kernel(config, nc, n_lights)
    grid = (n // BN, nsteps)

    def cmap(i, j, cb_ref, meta_ref, ord_ref):
        # Chunk-stream block index: phase A visits the block's j-th
        # nearest chunk; phase B (shadow any-hit) revisits the same
        # sequence at j - nc.
        jj = jnp.where(j < nc, j, j - nc) if nee else j
        return (0, ord_ref[i * nc + jj])

    in_specs = [
        pl.BlockSpec((FS_R, BN), lambda i, j, *_: (0, i)),
        pl.BlockSpec((IS_R, BN), lambda i, j, *_: (0, i)),
        pl.BlockSpec((4, BT), cmap),
        pl.BlockSpec((4, BT), cmap),
        pl.BlockSpec((4, BT), cmap),
        pl.BlockSpec((TAB_R, BT), cmap),
    ]
    operands = [fstate, istate, mu, mv, mw, tab]
    if nee:
        in_specs.append(pl.BlockSpec(lt.shape, lambda i, j, *_: (0, 0)))
        operands.append(lt)
    scratch = [pltpu.VMEM((OUT_R, BN), jnp.float32),
               pltpu.VMEM((4, BN), jnp.float32),
               pltpu.VMEM((4, BN), jnp.float32)]
    if nee:
        scratch += [pltpu.VMEM((4, BN), jnp.float32),
                    pltpu.VMEM((4, BN), jnp.float32),
                    pltpu.VMEM((8, BN), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk bounds + [bounce] + visit order
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((FS_R, BN), lambda i, j, *_: (0, i)),
                   pl.BlockSpec((IS_R, BN), lambda i, j, *_: (0, i))],
        scratch_shapes=scratch,
    )
    e = mu.shape[1]
    fs2, is2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((FS_R, n), jnp.float32,
                                        vma=out_vma(fstate, istate, mu)),
                   jax.ShapeDtypeStruct((IS_R, n), jnp.int32,
                                        vma=out_vma(fstate, istate, mu))],
        cost_estimate=pl.CostEstimate(
            flops=(2 * 6 * 4 + 12 + 2 * TAB_R) * n * e * (2 if nee else 1),
            bytes_accessed=(2 * (FS_R + IS_R) * n
                            + (3 * 4 + TAB_R) * e * (2 if nee else 1)) * 4,
            transcendentals=8 * n,
        ),
        interpret=interpret,
    )(chunk_flat, meta, order, *operands)
    return fs2, is2


def _build_light_block(scene: Scene) -> jnp.ndarray:
    """(LT_R, L_pad) resident light table: LightTable.rows.T + cdf row,
    lane-padded to 128 with cdf=2.0 (never selected by searchsorted)."""
    lt = build_light_table(scene)
    rows = lt.rows.T  # (17, L)
    cdf = lt.cdf[None, :]
    blk = jnp.concatenate(
        [rows, cdf, jnp.zeros((LT_R - 18, rows.shape[1]), jnp.float32)],
        axis=0)
    l_pad = max(128, -(-rows.shape[1] // 128) * 128)
    pad = l_pad - rows.shape[1]
    if pad:
        pcol = jnp.zeros((LT_R, pad), jnp.float32).at[17, :].set(2.0)
        blk = jnp.concatenate([blk, pcol], axis=1)
    return blk


def path_trace_mega(scene: Scene, ray, seed, config: RenderConfig,
                    far: float = 1000.0, interpret: bool = False):
    """Drop-in fused replacement for integrator.path_trace (same transport,
    same PCG2D stream). Returns a PathTraceResult."""
    from gdpathtracing_tpu.render.integrator import PathTraceResult

    interpret = interpret or _FORCE_INTERPRET
    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN
    prep = prepare_trace_inputs(scene)
    assert not prep.superchunks, "mega requires a flat (<=16-chunk) scene"
    nc = scene.isect_mu.shape[1] // BT
    nee = config.nee and scene.n_lights > 0

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    fstate = jnp.zeros((FS_R, n_pad), jnp.float32)
    fstate = fstate.at[0, :].set(pad(ray.o.x))
    fstate = fstate.at[1, :].set(pad(ray.o.y))
    fstate = fstate.at[2, :].set(pad(ray.o.z))
    fstate = fstate.at[3, :].set(pad(ray.d.x, 1.0))
    fstate = fstate.at[4, :].set(pad(ray.d.y, 1.0))
    fstate = fstate.at[5, :].set(pad(ray.d.z, 1.0))
    for r in (6, 7, 8):  # throughput = 1
        fstate = fstate.at[r, :].set(pad(jnp.ones(n, jnp.float32)))
    fstate = fstate.at[12, :].set(pad(jnp.ones(n, jnp.float32)))  # active
    fstate = fstate.at[13, :].set(jnp.full(n_pad, far, jnp.float32))
    fstate = fstate.at[14, :].set(jnp.full(n_pad, -1.0, jnp.float32))

    sx, sy = seed
    istate = jnp.zeros((IS_R, n_pad), jnp.int32)
    istate = istate.at[0, :n].set(jax.lax.bitcast_convert_type(sx, jnp.int32))
    istate = istate.at[1, :n].set(jax.lax.bitcast_convert_type(sy, jnp.int32))

    lt = _build_light_block(scene) if nee else \
        jnp.zeros((LT_R, 128), jnp.float32)

    # Per-bounce stream compaction (config.compact_rays): stable-partition
    # the packed state so live rays fill the leading blocks and dead rays
    # park in all-dead tail blocks that fail every chunk slab test — the
    # TPU analog of SIMT early thread exit (main.glsl:390-396). A cumsum
    # prefix-sum partition (no argsort) + one scatter + two row-matrix
    # gathers; bit-transparent because every per-ray output (radiance,
    # depth, steps, segments) is permutation-invariant.
    compact = config.compact_rays
    if compact is None:
        compact = n_pad >= 4 * BN
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    src = iota  # original slot of the ray at each current position

    for b in range(config.bounces):
        if compact and b > 0:
            # Stable counting sort by (live octant | dead): 9 buckets,
            # one cumsum each — direction-coherent live blocks (per-block
            # slab cull can reject chunks behind the whole block) and
            # all-dead tail blocks, without a bitonic argsort.
            act = fstate[12, :] > 0.0
            octant = ((fstate[3, :] > 0.0).astype(jnp.int32) * 4
                      + (fstate[4, :] > 0.0).astype(jnp.int32) * 2
                      + (fstate[5, :] > 0.0).astype(jnp.int32))
            key = jnp.where(act, octant, 8)
            dest = jnp.zeros(n_pad, jnp.int32)
            base = jnp.int32(0)
            for bk in range(9):
                m = key == bk
                r = jnp.cumsum(m.astype(jnp.int32))
                dest = jnp.where(m, base + r - 1, dest)
                base = base + r[-1]
            perm = jnp.zeros(n_pad, jnp.int32).at[dest].set(iota)
            # Permute via ROW gathers of the transposed state: one
            # contiguous (FS_R·4 B)-row fetch per ray instead of FS_R
            # scattered column elements (TPU gathers want packed rows).
            fstate = fstate.T[perm].T
            istate = istate.T[perm].T
            src = src[perm]
        meta = jnp.array([b], jnp.int32)
        # Per-block near-to-far chunk visit order from the CURRENT bounce
        # origins (dead rays parked out of the centroid); phase B reuses
        # it for the shadow rays (origins = hit points, same region).
        from gdpathtracing_tpu.ops.intersect_pallas import \
            _block_chunk_order
        act = fstate[12, :] > 0.0
        o4m = jnp.stack([jnp.where(act, fstate[0, :], _PARK),
                         jnp.where(act, fstate[1, :], _PARK),
                         jnp.where(act, fstate[2, :], _PARK)], axis=0)
        order = _block_chunk_order(
            o4m, scene.isect_chunk_bounds).reshape(-1)
        fstate, istate = _mega_step(
            prep.chunk_flat, meta, order, fstate, istate,
            prep.mu, prep.mv, prep.mw, prep.tab, lt,
            config, nc, scene.n_lights if nee else 0, interpret)

    if compact:
        inv = jnp.zeros(n_pad, jnp.int32).at[src].set(iota)
        fstate = fstate.T[inv].T
        istate = istate.T[inv].T

    return PathTraceResult(
        radiance=Vec3(fstate[9, :n], fstate[10, :n], fstate[11, :n]),
        depth=fstate[13, :n],
        steps=istate[2, :n],
        segments=istate[3, :n],
        normal=Vec3(fstate[15, :n], fstate[16, :n], fstate[17, :n]),
    )
