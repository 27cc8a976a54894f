"""Round-4 diagnostic: where does the flat ~100 ms/bounce actually go?

Two competing explanations of round 3's liveness-independent bounce cost
(docs/STATUS.md campaign A):
  (a) XLA glue — dozens of elementwise kernels over the full wavefront
      (the VERDICT's lever-1 premise), or
  (b) the rows-kernel sweep itself on INCOHERENT rays — every live block
      sweeps every chunk, paying the (BN, BT) VPU epilogue ~nc times
      (round-3 campaign numbers all fit this: compaction/m3/tile-size
      moved nothing because the sweep, not DMA/dispatch/glue, dominates).

Stages (run one per process — remote-compile request bodies are limited,
docs/STATUS.md "Megakernel HTTP 413"):
  frame   — 5-bounce path_trace on one 256k tile: REAL pallas trace vs a
            FAKE trace_fn returning precomputed rows (glue-only). The
            difference isolates the kernel; the fake is the glue.
  kernels — trace_pallas in isolation: coherent camera rays vs incoherent
            15%-live bounce-2-like rays; occluded_pallas on shadow-like
            rays (NEE phase-B unit cost).
  micro   — gather/scatter microbenches at frame size (2.07M): prices the
            per-ray packing / path-regeneration designs (scatter-at-death,
            row gathers) against the known 27 ns/elem gather wall.

Timing discipline: K in-graph repeats inside ONE jitted scan with a
carry data-dependency (CLAUDE.md "Measurement discipline"); the barrier
is a full np.asarray transfer of the scalar checksum.

Run: bash examples/profile_r4.sh   (logs to examples/profile_r4.log)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gdpathtracing_tpu.config import RenderConfig, Traversal
from gdpathtracing_tpu.core import rng
from gdpathtracing_tpu.core.vec import Vec3
from gdpathtracing_tpu.render.integrator import path_trace
from gdpathtracing_tpu.render.types import HitInfo, Ray
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080
TILE = 262144
NFULL = 2073600  # 1080p pixel count, the full-frame wavefront
K = 8

FLOOR = 0.0


def timeit(fn, *args, iters=4):
    t0 = time.time()
    v = float(np.asarray(fn(*args)))
    compile_s = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), compile_s, v


def bench_scan(name, step, x0=None, k=K):
    """step: scalar carry -> scalar. Times k in-graph repeats."""
    x0 = jnp.float32(0.0) if x0 is None else x0

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=k)
        return c

    tmin, comp, v = timeit(run, x0)
    per = (tmin - FLOOR) / k * 1e3
    print(f"{name:52s} {per:9.2f} ms/iter  (total {tmin*1e3:8.1f} ms, "
          f"compile {comp:5.1f}s, chk {v:.6g})", flush=True)
    return per


def setup():
    global FLOOR
    print("devices:", jax.devices(), flush=True)
    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)
    noop = jax.jit(lambda c: c + 1.0)
    FLOOR, _, _ = timeit(noop, jnp.float32(0.0))
    print(f"dispatch floor: {FLOOR*1e3:.1f} ms", flush=True)
    return scene, camera


def camera_rays(scene, camera, cfg, n=TILE):
    pids = jnp.arange(n, dtype=jnp.int32)
    px = (pids % W).astype(jnp.uint32)
    py = (pids // W).astype(jnp.uint32)
    seed = rng.prng_seed(px, py, jnp.uint32(0))
    ray, seed = camera.generate_rays(pids, seed, cfg)
    return ray, seed


def incoherent_rays(scene, n=TILE, live_frac=0.15, rng_seed=0):
    """Bounce-2-like wavefront: random origins inside the scene bounds,
    random unit directions, live mask scattered at `live_frac` (the demo's
    measured bounce-2 survivor density)."""
    cb = np.asarray(scene.isect_chunk_bounds)
    lo = cb[0:3].min(axis=1)[:, None]
    hi = cb[3:6].max(axis=1)[:, None]
    r = np.random.default_rng(rng_seed)
    o = lo + (hi - lo) * r.random((3, n), dtype=np.float32) * 0.9
    d = r.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    live = r.random(n) < live_frac
    ray = Ray(Vec3(*(jnp.asarray(a) for a in o)),
              Vec3(*(jnp.asarray(a) for a in d)))
    return ray, jnp.asarray(live)


def stage_frame(scene, camera):
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)
    ray, seed = camera_rays(scene, camera, cfg)

    def real(c):
        r = Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)
        res = path_trace(scene, r, seed, cfg, far=camera.far)
        return (res.radiance.x.sum() + res.depth.sum() * 1e-9
                + res.segments.sum().astype(jnp.float32) * 1e-9)

    a = bench_scan("path_trace 5b REAL pallas (256k tile)", real, k=4)

    # Precompute one real hit, then replay it as a constant trace_fn: the
    # bounce loop runs ALL its glue (shading, brdf, rng, carries, group
    # compaction) but zero kernel work. rows is tied to the evolving ray
    # origin so XLA cannot hoist shading out of the bounce loop.
    from gdpathtracing_tpu.ops.intersect_pallas import trace_pallas
    hit0 = jax.jit(lambda r: trace_pallas(scene, r, None))(ray)
    hit0 = jax.tree.map(jnp.asarray, hit0)

    def fake_trace(scene_, r, active):
        rows = hit0.rows + r.o.x[None, :] * 1e-30
        t = rows[40]
        return HitInfo(t=jnp.where(active, t, 1e9), tri=hit0.tri,
                       inst=hit0.inst, u=hit0.u, v=hit0.v, front=hit0.front,
                       steps=hit0.steps, eidx=hit0.eidx, rows=rows)

    def fake(c):
        r = Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)
        res = path_trace(scene, r, seed, cfg, trace_fn=fake_trace,
                         far=camera.far)
        return (res.radiance.x.sum() + res.depth.sum() * 1e-9
                + res.segments.sum().astype(jnp.float32) * 1e-9)

    b = bench_scan("path_trace 5b FAKE trace (glue only)", fake, k=4)
    print(f"==> glue/bounce ~{b/5:.2f} ms, kernel+prep/bounce "
          f"~{(a-b)/5:.2f} ms (x8 tiles: glue {b/5*8:.1f}, "
          f"kernel {(a-b)/5*8:.1f} ms/bounce/frame)", flush=True)


def stage_kernels(scene, camera):
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)
    from gdpathtracing_tpu.ops.intersect_pallas import (occluded_pallas,
                                                        trace_pallas)
    ray, _ = camera_rays(scene, camera, cfg)
    act = jnp.ones(TILE, bool)

    def coh(c):
        r = Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)
        h = trace_pallas(scene, r, act)
        return h.t.sum() + h.u.sum()

    bench_scan("trace_pallas coherent camera rays (256k)", coh)

    iray, ilive = incoherent_rays(scene)

    def inc(c):
        r = Ray(Vec3(iray.o.x + c * 1e-12, iray.o.y, iray.o.z), iray.d)
        h = trace_pallas(scene, r, ilive)
        return h.t.sum() + h.u.sum()

    bench_scan("trace_pallas incoherent 15%-live (256k)", inc)

    iray2, _ = incoherent_rays(scene, rng_seed=1)

    def inc_full(c):
        r = Ray(Vec3(iray2.o.x + c * 1e-12, iray2.o.y, iray2.o.z), iray2.d)
        h = trace_pallas(scene, r, jnp.ones(TILE, bool))
        return h.t.sum() + h.u.sum()

    bench_scan("trace_pallas incoherent 100%-live (256k)", inc_full)

    # Shadow-like rays: origins on scene geometry (reuse incoherent
    # origins), directions at the demo light (0, 2.956, 0).
    sray, slive = incoherent_rays(scene, rng_seed=2)
    ldx = 0.0 - sray.o.x
    ldy = 2.956 - sray.o.y
    ldz = 0.0 - sray.o.z
    dist = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
    sdir = Vec3(ldx / dist, ldy / dist, ldz / dist)
    tmax = dist * (1.0 - 1e-3)

    def occ(c):
        r = Ray(Vec3(sray.o.x + c * 1e-12, sray.o.y, sray.o.z), sdir)
        return occluded_pallas(scene, r, tmax, slive
                               ).sum().astype(jnp.float32)

    bench_scan("occluded_pallas shadow rays 15%-live (256k)", occ)


def stage_frame2(scene, camera):
    """Round-4 mystery: an isolated 5-bounce 256k path_trace costs ~12 ms,
    but the 8-tile 1080p frame costs ~430 ms — 4x the sum of its parts.
    Decompose: full render_radiance vs raw path_trace at several tile
    shapes, and the regen frame."""
    from gdpathtracing_tpu.render.renderer import render_radiance
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)

    def frame(c, config):
        aovs = render_radiance(scene, camera, config,
                               jnp.uint32(3) + (c * 1e-12).astype(jnp.uint32))
        return (aovs.radiance.sum() + c * 1e-30
                + aovs.segments.sum().astype(jnp.float32) * 1e-9)

    bench_scan("render_radiance tiles=256k (1080p)",
               lambda c: frame(c, cfg), k=2)
    bench_scan("render_radiance tiles=2.07M (1 tile)",
               lambda c: frame(c, cfg.replace(tile_rays=2073600)), k=2)

    ray, seed = camera_rays(scene, camera, cfg, n=NFULL)

    def pt_full(c):
        r = Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)
        res = path_trace(scene, r, seed, cfg, far=camera.far)
        return res.radiance.x.sum() + res.segments.sum().astype(
            jnp.float32) * 1e-9

    bench_scan("path_trace 5b 2.07M single call", pt_full, k=2)

    ray8, seed8 = camera_rays(scene, camera, cfg, n=TILE * 8)

    def pt_8x(c):
        tot = c * 1e-30
        for tk in range(8):
            sl = slice(tk * TILE, (tk + 1) * TILE)
            r = Ray(Vec3(ray8.o.x[sl] + tot * 1e-12, ray8.o.y[sl],
                         ray8.o.z[sl]), Vec3(ray8.d.x[sl], ray8.d.y[sl],
                                             ray8.d.z[sl]))
            res = path_trace(scene, r, (seed8[0][sl], seed8[1][sl]), cfg,
                             far=camera.far)
            tot = tot + res.radiance.x.sum()
        return tot

    bench_scan("path_trace 5b 8x256k chained", pt_8x, k=2)

    def pt_nocompact(c):
        r = Ray(Vec3(ray8.o.x[:TILE] + c * 1e-12, ray8.o.y[:TILE],
                     ray8.o.z[:TILE]),
                Vec3(ray8.d.x[:TILE], ray8.d.y[:TILE], ray8.d.z[:TILE]))
        res = path_trace(scene, r, (seed8[0][:TILE], seed8[1][:TILE]),
                         cfg.replace(compact_rays=False), far=camera.far)
        return res.radiance.x.sum()

    bench_scan("path_trace 5b 256k compact OFF", pt_nocompact, k=4)

    bench_scan("render_radiance REGEN (1080p)",
               lambda c: frame(c, cfg.replace(regen=True)), k=2)


def stage_micro(scene, camera):
    n = NFULL
    r = np.random.default_rng(0)
    perm = jnp.asarray(r.permutation(n).astype(np.int32))
    x0 = jnp.asarray(r.random(n, dtype=np.float32))
    rows8 = jnp.asarray(r.random((n, 8), dtype=np.float32))
    rows48 = jnp.asarray(r.random((n, 48), dtype=np.float32))
    mask = jnp.asarray(r.random(n) < 0.45)

    # NOTE: a (N,48)[perm] row gather HUNG the remote compiler for 20+
    # minutes (round-4 session log) — do not benchmark that shape.
    del rows48
    bench_scan("scatter-set zeros[perm] = x",
               lambda c: jnp.zeros(n, jnp.float32).at[perm].set(x0 + c)
               .sum())
    bench_scan("scatter-add zeros[perm] += x",
               lambda c: jnp.zeros(n, jnp.float32).at[perm].add(x0 + c)
               .sum())
    bench_scan("row scatter-set zeros(N,8)[perm] = rows",
               lambda c: jnp.zeros((n, 8), jnp.float32).at[perm]
               .set(rows8 + c).sum())
    dropped = jnp.where(mask, perm, n)  # 45% live, rest dropped
    bench_scan("masked (45%) row scatter mode=drop",
               lambda c: jnp.zeros((n, 8), jnp.float32)
               .at[dropped].set(rows8 + c, mode="drop").sum())
    # The regeneration primitive: one cumsum over the wavefront.
    bench_scan("cumsum i32 (2.07M)",
               lambda c: jnp.cumsum((x0 + c < 0.45).astype(jnp.int32))[-1]
               .astype(jnp.float32))


def stage_micro2(scene, camera):
    """Shapes for the regen retire/compaction redesign: packed-row gather
    widths (the (N,48) gather hung the compiler once — bracket the safe
    width), scalar-scatter index-count scaling, and the compacted-retire
    pattern (scatter lane ids by rank, gather rows, scatter columns)."""
    r = np.random.default_rng(0)
    for n, w in ((NFULL, 16), (NFULL, 24), (TILE, 24)):
        perm = jnp.asarray(r.permutation(n).astype(np.int32))
        rows = jnp.asarray(r.random((n, w), dtype=np.float32))
        bench_scan(f"row gather ({n//1000}k,{w})[perm]",
                   lambda c, rows=rows, perm=perm: (rows + c)[perm].sum())
    for n in (TILE, TILE // 4):
        perm = jnp.asarray(r.permutation(NFULL)[:n].astype(np.int32))
        x = jnp.asarray(r.random(n, dtype=np.float32))
        bench_scan(f"scalar scatter {n//1000}k idx into 2.07M",
                   lambda c, x=x, perm=perm: jnp.zeros(NFULL, jnp.float32)
                   .at[perm].set(x + c).sum())

    # Compacted retire: ~1/3 of 256k lanes retire; build the dead list by
    # rank (1 scalar scatter), row-gather their 9-col rows, then 9 scalar
    # scatters at the compacted index count.
    nw, budget = TILE, TILE // 2
    dead = jnp.asarray(r.random(nw) < 0.33)
    pid = jnp.asarray(r.permutation(NFULL)[:nw].astype(np.int32))
    rows9 = jnp.asarray(r.random((nw, 9), dtype=np.float32))

    def retire(c):
        rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
        slot = jnp.where(dead & (rank < budget), rank, budget)
        lanes = jnp.zeros(budget + 1, jnp.int32).at[slot].set(
            jnp.arange(nw, dtype=jnp.int32), mode="drop")[:budget]
        sel_rows = (rows9 + c)[lanes]          # (budget, 9) row gather
        sel_pid = pid[lanes]
        out = jnp.zeros((NFULL, 9), jnp.float32)
        tot = c * 1e-30
        for col in range(9):
            tot = tot + out[:, col].at[sel_pid].set(
                sel_rows[:, col]).sum()
        return tot

    bench_scan("compacted retire (256k lanes, 9 cols)", retire)


def stage_micro3(scene, camera):
    """Isolated regen stage costs at nw=256k (the fixed-iteration
    knock-outs interact through lane liveness — skip_spawn kills the
    wavefront and deflates the trace — so measure stages standalone)."""
    nw = TILE
    cfg = RenderConfig(bounces=5, traversal=Traversal.PALLAS)
    from gdpathtracing_tpu.render import regen as regen_mod
    from gdpathtracing_tpu.render import brdf
    from gdpathtracing_tpu.render.shading import get_shading_data
    from gdpathtracing_tpu.core import rng as rng_mod

    # spawn: path-id arithmetic + prng + camera ray
    n_pix = W * H
    ids0 = jnp.arange(nw, dtype=jnp.int32)

    def spawn(c):
        path_id = (ids0 + c.astype(jnp.int32)) % n_pix
        pix = path_id % n_pix
        s = (path_id // n_pix).astype(jnp.uint32)
        px = (pix % W).astype(jnp.uint32)
        py = (pix // W).astype(jnp.uint32)
        seed = rng_mod.prng_seed(px, py, s)
        ray, seed = camera.generate_rays(pix, seed, cfg)
        return ray.d.x.sum() + seed[0].sum().astype(jnp.float32) * 1e-9

    bench_scan("spawn (ids->camera rays, 256k)", spawn)

    # glue: shading + brdf sample/pdf/eval + carries, on a real hit set
    iray, _ = incoherent_rays(scene, n=nw, live_frac=1.0)
    from gdpathtracing_tpu.ops.intersect_pallas import trace_pallas
    hit = jax.jit(lambda r: trace_pallas(scene, r, None))(iray)
    hit = jax.tree.map(jnp.asarray, hit)
    seed0 = (jnp.arange(nw, dtype=jnp.uint32),
             jnp.arange(nw, dtype=jnp.uint32) * 7)

    def glue(c):
        h = hit._replace(rows=hit.rows + c * 1e-30)
        s = get_shading_data(scene, h, iray, fast=True)
        (r1, r2), sd = rng_mod.pcg2d(seed0)
        nd = brdf.sample_brdf(s, r1, r2)
        pdf = brdf.brdf_pdf(s, nd)
        f = brdf.eval_brdf(s, nd)
        lam = s.normal.dot(nd)
        scale = jnp.where(pdf > 1e-12, lam / jnp.maximum(pdf, 1e-12), 0.0)
        return (f * scale).x.sum() + nd.y.sum()

    bench_scan("glue (shading+brdf sample/pdf/eval, 256k)", glue)

    # append: rank scatter + row gather + DUS into a 93 MB log
    r = np.random.default_rng(0)
    dead = jnp.asarray(r.random(nw) < 0.6)
    rows10 = jnp.asarray(r.random((nw, 10), dtype=np.float32))
    log0 = jnp.zeros((n_pix + nw, 10), jnp.float32)
    lane_iota = jnp.arange(nw, dtype=jnp.int32)

    def append(c):
        mask = dead
        mask_i = mask.astype(jnp.int32)
        rank = jnp.cumsum(mask_i)
        nd_ = rank[-1]
        alive_rank = jnp.cumsum(1 - mask_i)
        dest = jnp.where(mask, rank, nd_ + alive_rank) - 1
        lanes = jnp.zeros(nw, jnp.int32).at[dest].set(lane_iota)
        log = jax.lax.dynamic_update_slice(
            log0, (rows10 + c)[lanes], (c.astype(jnp.int32) % 16, 0))
        return log[0].sum() + nd_.astype(jnp.float32)

    bench_scan("append (rank scatter+gather+DUS, 256k)", append)

    # lane permute: pack 17+9 cols, gather, unpack
    cols = [jnp.asarray(r.random(nw, dtype=np.float32)) for _ in range(17)]
    perm0 = jnp.asarray(r.permutation(nw).astype(np.int32))

    def permute(c):
        fm = jnp.stack([x + c for x in cols], axis=1)[perm0]
        return fm[:, 0].sum() + fm[:, 16].sum()

    bench_scan("lane permute (17-col pack+gather, 256k)", permute)


def stage_micro4(scene, camera):
    """Is the retirement log's PADDED layout ((N, 10) f32 tiles pad the
    minor dim to 128 lanes → ~1 GB physical) the regen mystery cost?
    Measure the in-loop DUS append, the final [inv] reorder gather, and
    the column-scatter alternative (1-D outputs never pad)."""
    r = np.random.default_rng(0)
    nw, npth = TILE, NFULL
    rows10 = jnp.asarray(r.random((nw, 10), dtype=np.float32))
    log0 = jnp.zeros((npth + nw, 10), jnp.float32)
    inv = jnp.asarray(r.permutation(npth).astype(np.int32))
    pid = jnp.asarray(r.permutation(npth)[:nw].astype(np.int32))
    dead = jnp.asarray(r.random(nw) < 0.6)

    def dus_carry(c):
        # the log as a scan carry, DUS per iteration (regen's shape)
        def body(carry, i):
            log, ptr = carry
            log = jax.lax.dynamic_update_slice(
                log, rows10 + ptr.astype(jnp.float32) * 1e-30, (ptr, 0))
            return (log, ptr + 131072), i
        (log, _), _ = jax.lax.scan(
            body, (log0 + c * 1e-30, jnp.int32(0)), jnp.arange(8))
        return log[0].sum()

    tmin, comp, v = timeit(jax.jit(dus_carry), jnp.float32(0))
    print(f"{'DUS append into (2.07M,10) carry':52s} "
          f"{(tmin - FLOOR)/8*1e3:9.2f} ms/iter  (compile {comp:.0f}s)",
          flush=True)

    bench_scan("final reorder log[inv] ((2.07M,10) gather)",
               lambda c: (log0 + c)[inv][:, 1].sum(), k=2)

    out0 = [jnp.zeros(npth, jnp.float32) for _ in range(10)]

    def colscatter(c):
        idx = jnp.where(dead, pid, npth)
        tot = c * 1e-30
        for k in range(10):
            tot = tot + out0[k].at[idx].set(rows10[:, k] + c,
                                            mode="drop").sum()
        return tot

    bench_scan("10 column scatters into 1-D outputs (256k idx)",
               colscatter)


def stage_bwd(scene, camera):
    """Decompose the backward frame (round 3: 1638 ms fwd+bwd vs 430
    primal): diff-mode forward-only vs value_and_grad — separates the
    differentiable-recompute forward overhead from the reverse pass."""
    from gdpathtracing_tpu.diff.inverse import image_mse, replace_albedo
    from gdpathtracing_tpu.render.renderer import render_radiance
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS,
                       differentiable=True)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def loss(albedo, f):
        aovs = render_radiance(replace_albedo(scene, albedo), camera,
                               cfg, f)
        return image_mse(aovs.radiance, target)

    def fwd_only(c):
        albedo = scene.mat_albedo + c * 1e-30
        return loss(albedo, jnp.uint32(3)) + c * 1e-30

    bench_scan("diff-mode forward only (1080p loss)", fwd_only, k=2)

    def fwd_bwd(c):
        albedo = scene.mat_albedo + c * 1e-30
        l, g = jax.value_and_grad(loss)(albedo, jnp.uint32(3))
        return l + g.sum() * 1e-6 + c * 1e-30

    bench_scan("value_and_grad (1080p loss)", fwd_bwd, k=2)

    cfg_nc = cfg.replace(bwd_checkpoint=False)

    def loss_nc(albedo, f):
        aovs = render_radiance(replace_albedo(scene, albedo), camera,
                               cfg_nc, f)
        return image_mse(aovs.radiance, target)

    def fwd_bwd_nc(c):
        albedo = scene.mat_albedo + c * 1e-30
        l, g = jax.value_and_grad(loss_nc)(albedo, jnp.uint32(3))
        return l + g.sum() * 1e-6 + c * 1e-30

    bench_scan("value_and_grad NO per-bounce checkpoint", fwd_bwd_nc, k=2)

    # Non-diff forward at the same shapes for reference.
    cfg2 = cfg.replace(differentiable=False)

    def fwd_plain(c):
        aovs = render_radiance(scene, camera, cfg2,
                               jnp.uint32(3) + (c * 1e-12).astype(jnp.uint32))
        return aovs.radiance.sum() + c * 1e-30

    bench_scan("plain forward (same harness)", fwd_plain, k=2)


def stage_micro5(scene, camera):
    """Price the regen v4 FINAL log indexing (round 5b): pos scatter +
    transpose + split row gathers at n_paths=2.07M, vs width/split
    alternatives. The in-loop work is already measured; this is the one
    frame-scope op never isolated."""
    r = np.random.default_rng(0)
    npth, nw = NFULL, 393216
    LOG_R = 10
    log0 = jnp.asarray(r.random((LOG_R, npth + nw), dtype=np.float32))
    pid_l = jnp.asarray(r.permutation(npth).astype(np.int32))
    iota = jnp.arange(npth, dtype=jnp.int32)

    def pos_of(c):
        pl_ = pid_l ^ (c.astype(jnp.int32) & 0)
        return jnp.zeros(npth, jnp.int32).at[pl_].set(iota, mode="drop")

    bench_scan("final: pos scatter only (2.07M)",
               lambda c: pos_of(c).sum() + c)

    def cur(c):
        pos = pos_of(c)
        log = log0 + c * 1e-30
        rows8 = log[0:8, :npth].T[pos]
        rows2 = log[8:LOG_R, :npth].T[pos]
        return rows8[:, 0].sum() + rows2[:, 0].sum()

    bench_scan("final: scatter + 8/2-split T gathers (CURRENT)", cur, k=2)

    def one10(c):
        pos = pos_of(c)
        log = log0 + c * 1e-30
        rows = log[:, :npth].T[pos]
        return rows[:, 0].sum() + rows[:, 9].sum()

    bench_scan("final: scatter + one (2.07M,10) T gather", one10, k=2)

    def mat8(c):
        # materialize the transpose (opt barrier) so the gather source
        # is a contiguous row-major buffer, then one 8-wide gather
        pos = pos_of(c)
        log = log0 + c * 1e-30
        t8 = jax.lax.optimization_barrier(log[0:8, :npth].T)
        t2 = jax.lax.optimization_barrier(log[8:LOG_R, :npth].T)
        return t8[pos][:, 0].sum() + t2[pos][:, 0].sum()

    bench_scan("final: materialized-T + 8/2 gathers", mat8, k=2)

    def split4(c):
        pos = pos_of(c)
        log = log0 + c * 1e-30
        tot = c * 1e-30
        for s in range(0, LOG_R, 4):
            e = min(s + 4, LOG_R)
            tot = tot + log[s:e, :npth].T[pos][:, 0].sum()
        return tot

    bench_scan("final: scatter + 4/4/2-split T gathers", split4, k=2)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    scene, camera = setup()
    if stage in ("frame", "all"):
        stage_frame(scene, camera)
    if stage in ("kernels", "all"):
        stage_kernels(scene, camera)
    if stage in ("frame2", "all"):
        stage_frame2(scene, camera)
    if stage in ("micro", "all"):
        stage_micro(scene, camera)
    if stage in ("micro2", "all"):
        stage_micro2(scene, camera)
    if stage == "micro3":
        stage_micro3(scene, camera)
    if stage == "micro4":
        stage_micro4(scene, camera)
    if stage == "micro5":
        stage_micro5(scene, camera)
    if stage == "bwd":  # heavy compile — run explicitly
        stage_bwd(scene, camera)
    print("done", flush=True)


if __name__ == "__main__":
    main()
