"""Fused path-tracing megakernel: the ENTIRE bounce loop in one Pallas
kernel — trace sweep, shading fetch, BRDF sampling, RNG — with the
wavefront state living in VMEM across all bounces.

This is the TPU re-imagining of the reference's megakernel
(main.glsl:405-436): where the GPU version gives each pixel a scalar
program, here each grid step owns a 256-ray block and

- traces via the chunked unit-triangle sweep (fori over Morton chunks with
  per-block AABB culling — same math as ops/intersect_pallas.py);
- fetches the winner's data (intersection columns + shading row, one
  combined (E, 32) table) with per-chunk one-hot matmuls — a
  (BN, BT) x (BT, 32) MXU op, skipped for chunks nobody won; the TPU-legal
  replacement for a per-ray gather;
- reuses the *same* jnp BRDF/sky/RNG modules as the wavefront integrator
  (pure jnp traces fine inside Pallas), so images are bit-comparable.

Constraints (the dispatcher falls back to the wavefront integrator
otherwise): no albedo textures, no HDRI environment, no NEE, no
transmission, expanded triangle count small enough for VMEM-resident
tables (E ≤ MAX_FUSED_TRIS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdpathtracing_tpu.config import RenderConfig
from gdpathtracing_tpu.core.vec import Vec3, where as vwhere
from gdpathtracing_tpu.render import brdf
from gdpathtracing_tpu.render.sky import sample_sky
from gdpathtracing_tpu.render.types import ShadingInfo
from gdpathtracing_tpu.scene.scene import Scene

BN = 256
BT = 256
_MISS = 1e9
_WD_EPS = 1e-12
_MIN_ROUGHNESS = 0.006
MAX_FUSED_TRIS = 16384  # (E,32) table + (4,E) cols stay VMEM-friendly

_PCG_A = 1664525
_PCG_C = 1013904223


def _pcg2d(sx, sy):
    """In-kernel PCG2D, same stream as core.rng.pcg2d."""
    a = jnp.uint32(_PCG_A)
    c = jnp.uint32(_PCG_C)
    sx = sx * a + c
    sy = sy * a + c
    sx = sx + sy * a
    sy = sy + sx * a
    sx = sx ^ (sx >> 16)
    sy = sy ^ (sy >> 16)
    sx = sx + sy * a
    sy = sy + sx * a
    sx = sx ^ (sx >> 16)
    sy = sy ^ (sy >> 16)

    def to_f32(w):
        # Mosaic has no uint32→float32 cast; hi/lo split via int32 is
        # exact up to the single final rounding — bit-identical to XLA's
        # convert (keeps parity with core.rng.pcg2d).
        hi = (w >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
        lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        return hi * 65536.0 + lo

    u = to_f32(sx) * jnp.float32(2.32830643654e-10)
    v = to_f32(sy) * jnp.float32(2.32830643654e-10)
    return (u, v), (sx, sy)


def _sweep(chunk_ref, mu_ref, mv_ref, mw_ref, n_chunks,
           ox, oy, oz, dx, dy, dz, active):
    """Closest hit over all chunks for one ray block → (t, eidx).

    Pure broadcast formulation: Mosaic rejects assembling (4, BN) ray
    matrices from 1-D rows (vector concat offset limits), so the K=4
    contractions are expanded into f32 [:, None]x[None, :] broadcasts —
    VPU work instead of a skinny MXU matmul, same math.
    """
    rdx = 1.0 / jnp.where(jnp.abs(dx) < 1e-30, 1e-30, dx)
    rdy = 1.0 / jnp.where(jnp.abs(dy) < 1e-30, 1e-30, dy)
    rdz = 1.0 / jnp.where(jnp.abs(dz) < 1e-30, 1e-30, dz)

    def body(c, carry):
        best_t, best_i = carry
        base = c * 8
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
        may_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < best_t) & active

        def hit_case(args):
            best_t, best_i = args
            sl = pl.ds(c * BT, BT)

            def dots(m_ref):
                m0 = m_ref[0, sl][None, :]
                m1 = m_ref[1, sl][None, :]
                m2 = m_ref[2, sl][None, :]
                m3 = m_ref[3, sl][None, :]
                comp_o = (ox[:, None] * m0 + oy[:, None] * m1
                          + oz[:, None] * m2 + m3)
                comp_d = (dx[:, None] * m0 + dy[:, None] * m1
                          + dz[:, None] * m2)
                return comp_o, comp_d

            u_o, u_d = dots(mu_ref)
            v_o, v_d = dots(mv_ref)
            w_o, w_d = dots(mw_ref)
            wd_ok = jnp.abs(w_d) > _WD_EPS
            inv_wd = jnp.where(wd_ok, w_d, 1.0)
            t = -w_o / inv_wd
            u = u_o + t * u_d
            v = v_o + t * v_d
            valid = wd_ok & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & \
                (u + v <= 1.0)
            # NOTE: no bool[:, None] broadcasts — Mosaic only supports
            # minor-dim insertion for 32-bit types. Dead rays are parked
            # outside the scene instead of masked here.
            t = jnp.where(valid, t, _MISS)
            tk = jnp.min(t, axis=1)
            k = jnp.argmin(t, axis=1).astype(jnp.int32)
            better = tk < best_t
            return (jnp.where(better, tk, best_t),
                    jnp.where(better, c * BT + k, best_i))

        return jax.lax.cond(jnp.any(may_hit), hit_case, lambda a: a,
                            (best_t, best_i))

    init = (jnp.full((BN,), _MISS, jnp.float32), jnp.zeros((BN,), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _gather_rows(table_ref, n_chunks, eidx, hit):
    """(BN, 32) winner-row fetch via per-chunk one-hot matmuls."""
    def body(c, acc):
        in_chunk = hit & (eidx >= c * BT) & (eidx < (c + 1) * BT)

        def gather_case(acc):
            local = jnp.where(in_chunk, eidx - c * BT, -1)  # -1 matches none
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (BN, BT), 1)
                      == local[:, None]).astype(jnp.float32)
            rows = table_ref[pl.ds(c * BT, BT), :]
            got = jax.lax.dot_general(
                onehot, rows,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return acc + got

        return jax.lax.cond(jnp.any(in_chunk), gather_case, lambda a: a, acc)

    return jax.lax.fori_loop(0, n_chunks, body,
                             jnp.zeros((BN, 32), jnp.float32))


def _make_kernel(config: RenderConfig, n_chunks: int, n_mats: int):
    bounces = config.bounces
    ray_eps = config.ray_eps

    def kernel(chunk_ref, o4_ref, d4_ref, meta_ref, mu_ref, mv_ref, mw_ref,
               table_ref, mat_ref,
               r_ref, g_ref, b_ref, depth_ref, segs_ref,
               nx_ref, ny_ref, nz_ref):
        i = pl.program_id(0)
        ox, oy, oz = o4_ref[0, :], o4_ref[1, :], o4_ref[2, :]
        dx, dy, dz = d4_ref[0, :], d4_ref[1, :], d4_ref[2, :]
        meta_bits = pltpu.bitcast(meta_ref[...], jnp.uint32)  # (8, BN)
        sx = meta_bits[0, :]
        sy = meta_bits[1, :]

        one_n = jnp.ones((BN,), jnp.float32)
        zero_n = jnp.zeros((BN,), jnp.float32)
        tp_x, tp_y, tp_z = one_n, one_n, one_n
        rad_x, rad_y, rad_z = zero_n, zero_n, zero_n
        active = one_n > 0.0
        depth = zero_n + 1e9
        segs = jnp.zeros((BN,), jnp.int32)
        n0x, n0y, n0z = zero_n, zero_n, zero_n

        mats = mat_ref[...].astype(jnp.float32)  # (n_mats_pad, 16)

        for bounce in range(bounces):  # static unroll
            t, eidx = _sweep(chunk_ref, mu_ref, mv_ref, mw_ref, n_chunks,
                             ox, oy, oz, dx, dy, dz, active)
            hit = (t < _MISS) & active
            segs = segs + active.astype(jnp.int32)

            row = _gather_rows(table_ref, n_chunks, eidx, hit)
            # row layout: [0:12] isect cols (mu4, mv4, mw4), [12:21] world
            # normals n0/n1/n2, [21:27] uvs, [27] mat_id.
            def dot4(c0, c1, c2, c3, x, y, z, w):
                return c0 * x + c1 * y + c2 * z + c3 * w

            u = dot4(row[:, 0], row[:, 1], row[:, 2], row[:, 3],
                     ox, oy, oz, one_n) + \
                t * dot4(row[:, 0], row[:, 1], row[:, 2], row[:, 3],
                         dx, dy, dz, zero_n)
            v = dot4(row[:, 4], row[:, 5], row[:, 6], row[:, 7],
                     ox, oy, oz, one_n) + \
                t * dot4(row[:, 4], row[:, 5], row[:, 6], row[:, 7],
                         dx, dy, dz, zero_n)
            w_d = dot4(row[:, 8], row[:, 9], row[:, 10], row[:, 11],
                       dx, dy, dz, zero_n)
            front = w_d < 0.0
            w_bc = 1.0 - u - v
            normal = Vec3(
                row[:, 12] * w_bc + row[:, 15] * u + row[:, 18] * v,
                row[:, 13] * w_bc + row[:, 16] * u + row[:, 19] * v,
                row[:, 14] * w_bc + row[:, 17] * u + row[:, 20] * v,
            ).normalize(eps=1e-20)
            normal = vwhere(front, normal, -normal)

            # material row via small one-hot matmul
            mat_id = row[:, 27].astype(jnp.int32)
            m_onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (BN, mats.shape[0]), 1) == mat_id[:, None])
            mrow = jax.lax.dot_general(
                m_onehot.astype(jnp.float32), mats,
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            albedo = Vec3(mrow[:, 0], mrow[:, 1], mrow[:, 2])
            energy = jnp.maximum(0.0, mrow[:, 6])
            emission = Vec3(mrow[:, 3] * energy, mrow[:, 4] * energy,
                            mrow[:, 5] * energy)
            metallic = mrow[:, 7]
            roughness = jnp.maximum(_MIN_ROUGHNESS, mrow[:, 8])

            d_vec = Vec3(dx, dy, dz)
            pos = Vec3(ox + t * dx, oy + t * dy, oz + t * dz)
            out_dir = -d_vec
            f0 = Vec3.full(0.02, like=albedo) + \
                (albedo - Vec3.full(0.02, like=albedo)) * metallic
            s = ShadingInfo(
                position=pos, normal=normal, out_dir=out_dir,
                lambert_out=normal.dot(out_dir), emission=emission,
                diffuse_albedo=albedo - albedo * metallic,
                fresnel_0=f0, roughness=roughness,
                transmission=zero_n, ior=zero_n + 1.5, albedo=albedo)

            sky = sample_sky(d_vec, config)
            emit = vwhere(hit, s.emission, sky)
            rad_x = jnp.where(active, rad_x + tp_x * emit.x, rad_x)
            rad_y = jnp.where(active, rad_y + tp_y * emit.y, rad_y)
            rad_z = jnp.where(active, rad_z + tp_z * emit.z, rad_z)

            if bounce == 0:
                depth = jnp.where(hit, t, depth)
                n0x = jnp.where(hit, normal.x, n0x)
                n0y = jnp.where(hit, normal.y, n0y)
                n0z = jnp.where(hit, normal.z, n0z)

            if bounce < bounces - 1:
                (r1, r2), (sx, sy) = _pcg2d(sx, sy)
                new_dir = brdf.sample_brdf(s, r1, r2)
                pdf = brdf.brdf_pdf(s, new_dir)
                lambert_in = s.normal.dot(new_dir)
                f = brdf.eval_brdf(s, new_dir)
                scale = jnp.where(pdf > 1e-12,
                                  lambert_in / jnp.maximum(pdf, 1e-12), 0.0)
                survive = hit & (lambert_in > 0.0) & (pdf > 1e-12)
                ox = jnp.where(survive, pos.x + normal.x * ray_eps, ox)
                oy = jnp.where(survive, pos.y + normal.y * ray_eps, oy)
                oz = jnp.where(survive, pos.z + normal.z * ray_eps, oz)
                dx = jnp.where(survive, new_dir.x, dx)
                dy = jnp.where(survive, new_dir.y, dy)
                dz = jnp.where(survive, new_dir.z, dz)
                tp_x = jnp.where(survive, tp_x * f.x * scale, tp_x)
                tp_y = jnp.where(survive, tp_y * f.y * scale, tp_y)
                tp_z = jnp.where(survive, tp_z * f.z * scale, tp_z)
                active = survive
                # Park dead rays (position far out, direction outward) so
                # the next sweep's chunk culling skips them entirely.
                ox = jnp.where(active, ox, 1e9)
                oy = jnp.where(active, oy, 1e9)
                oz = jnp.where(active, oz, 1e9)
                dx = jnp.where(active, dx, 0.5773503)
                dy = jnp.where(active, dy, 0.5773503)
                dz = jnp.where(active, dz, 0.5773503)

        r_ref[i, :] = rad_x
        g_ref[i, :] = rad_y
        b_ref[i, :] = rad_z
        depth_ref[i, :] = depth
        segs_ref[i, :] = segs
        nx_ref[i, :] = n0x
        ny_ref[i, :] = n0y
        nz_ref[i, :] = n0z

    return kernel


def fused_supported(scene: Scene, config: RenderConfig) -> bool:
    return (not config.nee and not scene.has_env
            and not scene.has_transmission
            and config.rr_start == 0
            and scene.textures.shape[0] == 1  # dummy slice only
            and int(jnp.shape(scene.isect_mu)[1]) <= MAX_FUSED_TRIS
            and (scene.mat_tex is not None))


def _build_table(scene: Scene) -> jnp.ndarray:
    """(E, 32) combined table: isect cols (12) + shade row (16) + pad."""
    e = scene.isect_cols.shape[0]
    return jnp.concatenate([
        scene.isect_cols,                       # 0:12
        scene.isect_shade,                      # 12:28 (n0,n1,n2,uvs,mat)
        jnp.zeros((e, 4), jnp.float32),
    ], axis=1)


def _build_mats(scene: Scene) -> jnp.ndarray:
    """(M_pad, 16) material rows, same layout as shading fast path."""
    m = jnp.concatenate([
        scene.mat_albedo, scene.mat_emission,
        scene.mat_emission_energy[:, None], scene.mat_metallic[:, None],
        scene.mat_roughness[:, None],
        scene.mat_tex.astype(jnp.float32)[:, None],
        scene.mat_transmission[:, None], scene.mat_ior[:, None],
        scene.mat_mr_tex.astype(jnp.float32)[:, None],
    ], axis=1)
    pad_cols = 16 - m.shape[1]
    m = jnp.pad(m, ((0, 0), (0, pad_cols)))
    pad_rows = (-m.shape[0]) % 8
    return jnp.pad(m, ((0, pad_rows), (0, 0)))


@functools.partial(jax.jit,
                   static_argnames=("config", "n_chunks", "interpret"))
def _run(chunk_flat, o4t, d4t, meta, mu, mv, mw, table, mats,
         config: RenderConfig, n_chunks: int, interpret=False):
    n = o4t.shape[1]
    gr = n // BN
    kernel = _make_kernel(config, n_chunks, mats.shape[0])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gr,),
        in_specs=[
            pl.BlockSpec((4, BN), lambda i, *_: (0, i)),
            pl.BlockSpec((4, BN), lambda i, *_: (0, i)),
            pl.BlockSpec((8, BN), lambda i, *_: (0, i)),
            pl.BlockSpec(mu.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(mv.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(mw.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(table.shape, lambda i, *_: (0, 0)),
            pl.BlockSpec(mats.shape, lambda i, *_: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((gr, BN), lambda i, *_: (0, 0))
                   for _ in range(8)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((gr, BN), jnp.float32) for _ in range(4)]
            + [jax.ShapeDtypeStruct((gr, BN), jnp.int32)]
            + [jax.ShapeDtypeStruct((gr, BN), jnp.float32) for _ in range(3)]
        ),
        interpret=interpret,
    )(chunk_flat, o4t, d4t, meta, mu, mv, mw, table, mats)
    return [a.reshape(-1) for a in out]


def path_trace_fused(scene: Scene, ray, seed, config: RenderConfig,
                     far: float = 1000.0, interpret: bool = False):
    """Drop-in fused replacement for integrator.path_trace (same RNG
    stream → bit-comparable images). Returns a PathTraceResult."""
    from gdpathtracing_tpu.render.integrator import PathTraceResult

    n = ray.o.x.shape[0]
    n_pad = -(-n // BN) * BN

    def pad(x, value=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=value)

    o4t = jnp.stack([pad(ray.o.x, 1e9), pad(ray.o.y, 1e9),
                     pad(ray.o.z, 1e9), pad(ray.o.x * 0 + 1.0)], axis=0)
    d4t = jnp.stack([pad(ray.d.x, 1.0), pad(ray.d.y, 1.0),
                     pad(ray.d.z, 1.0), pad(ray.d.x * 0)], axis=0)
    sx, sy = seed
    # int32 carrier: float32 would canonicalize NaN bit patterns and
    # corrupt ~0.4% of the uint32 seed space.
    meta = jnp.zeros((8, n_pad), jnp.int32)
    meta = meta.at[0, :n].set(jax.lax.bitcast_convert_type(sx, jnp.int32))
    meta = meta.at[1, :n].set(jax.lax.bitcast_convert_type(sy, jnp.int32))

    n_chunks = scene.isect_mu.shape[1] // BT
    out = _run(scene.isect_chunk_bounds.T.reshape(-1), o4t, d4t, meta,
               scene.isect_mu, scene.isect_mv, scene.isect_mw,
               _build_table(scene), _build_mats(scene),
               config, n_chunks, interpret)
    r, g, b, depth, segs, nx, ny, nz = [a[:n] for a in out]
    depth = jnp.where(depth >= 1e9, far, depth)
    return PathTraceResult(
        radiance=Vec3(r, g, b),
        depth=depth,
        steps=segs * scene.isect_mu.shape[1],
        segments=segs,
        normal=Vec3(nx, ny, nz),
    )
