"""Stage-level TPU profile, round 2: amortize the ~23 ms per-dispatch
tunnel latency by repeating each stage K times INSIDE one jitted program
(lax.scan with a serializing data dependency), then dividing.

Run: nohup python -u examples/profile_frame2.py > /tmp/profile2.log 2>&1 &
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
from gdpathtracing_tpu.render import brdf
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.render.shading import (get_shading_data_fast,
                                              sample_texture_array)
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080
TILE = 262144
K = 10


def timeit(name, fn, *args, iters=4):
    t0 = time.time()
    v = float(np.asarray(fn(*args)))
    compile_s = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), compile_s, v


FLOOR = None


def bench_scan(name, step, x0):
    """step: scalar carry -> scalar. Times K in-graph repeats."""
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=K)
        return c

    tmin, comp, v = timeit(name, run, x0)
    per = (tmin - FLOOR) / K * 1e3
    print(f"{name:44s} {per:9.2f} ms/iter  (total {tmin*1e3:8.1f} ms, "
          f"compile {comp:5.1f}s, chk {v:.4g})", flush=True)
    return per


def main():
    global FLOOR
    print("devices:", jax.devices(), flush=True)
    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)

    noop = jax.jit(lambda c: c + 1.0)
    FLOOR, _, _ = timeit("floor", noop, jnp.float32(0.0))
    print(f"dispatch floor: {FLOOR*1e3:.1f} ms", flush=True)

    # in-graph 2-frame scan → true per-frame compute
    @jax.jit
    def frames2(c):
        def body(c, f):
            aovs = render_radiance(scene, camera, cfg, f)
            return c + aovs.radiance.sum(), ()
        c, _ = jax.lax.scan(body, c, jnp.arange(2, dtype=jnp.uint32))
        return c

    tmin, comp, v = timeit("2 frames in-graph", frames2, jnp.float32(0.0))
    print(f"frame compute (amortized): {(tmin - FLOOR)/2*1e3:.1f} ms "
          f"(compile {comp:.0f}s)", flush=True)

    # ---- stage inputs -------------------------------------------------
    pids = jnp.arange(TILE, dtype=jnp.int32)
    px = (pids % W).astype(jnp.uint32)
    py = (pids // W).astype(jnp.uint32)
    seed0 = rng.prng_seed(px, py, jnp.uint32(0))
    ray, seed = camera.generate_rays(pids, seed0, cfg)
    active = jnp.ones(TILE, bool)

    from gdpathtracing_tpu.ops.intersect_pallas import (
        _closest_hit, occluded_pallas, trace_pallas)
    from gdpathtracing_tpu.render.types import Ray
    from gdpathtracing_tpu.core.vec import Vec3

    hit = jax.jit(lambda r, a: trace_pallas(scene, r, a))(ray, active)
    hit = jax.tree.map(jnp.asarray, hit)
    s_info = jax.jit(lambda h, r: get_shading_data_fast(scene, h, r))(
        hit, ray)
    s_info = jax.tree.map(jnp.asarray, s_info)

    def perturb_ray(c):
        d = c * 1e-12
        return Ray(Vec3(ray.o.x + d, ray.o.y, ray.o.z),
                   Vec3(ray.d.x, ray.d.y, ray.d.z))

    def st_kernel_raw(c):
        r = perturb_ray(c)
        o4t = jnp.stack([r.o.x, r.o.y, r.o.z, r.o.x * 0 + 1], axis=0)
        d4t = jnp.stack([r.d.x, r.d.y, r.d.z, r.d.x * 0], axis=0)
        t, idx = _closest_hit(o4t, d4t, scene.isect_chunk_bounds,
                              scene.isect_mu, scene.isect_mv, scene.isect_mw)
        return t.sum()

    bench_scan("closest-hit kernel raw (256k)", st_kernel_raw,
               jnp.float32(0))

    def st_wrapper(c):
        h = trace_pallas(scene, perturb_ray(c), active)
        return h.t.sum() + h.u.sum() + (h.tri + h.inst).sum().astype(
            jnp.float32) * 1e-9

    bench_scan("trace_pallas wrapper", st_wrapper, jnp.float32(0))

    tmax = jnp.full(TILE, 10.0, jnp.float32)

    def st_occl(c):
        return occluded_pallas(scene, perturb_ray(c), tmax, active
                               ).sum().astype(jnp.float32)

    bench_scan("occlusion wrapper", st_occl, jnp.float32(0))

    def st_shading(c):
        h = hit._replace(u=hit.u + c * 1e-12)
        s = get_shading_data_fast(scene, h, ray)
        return (s.normal.x.sum() + s.emission.x.sum()
                + s.diffuse_albedo.x.sum() + s.roughness.sum())

    bench_scan("get_shading_data_fast", st_shading, jnp.float32(0))

    def st_brdf(c):
        s = s_info._replace(roughness=s_info.roughness + c * 1e-12)
        sd = seed
        (r1, r2), sd = rng.pcg2d(sd)
        nd = brdf.sample_brdf(s, r1, r2)
        pdf = brdf.brdf_pdf(s, nd)
        f = brdf.eval_brdf(s, nd)
        return nd.x.sum() + pdf.sum() + f.x.sum()

    bench_scan("brdf sample+pdf+eval", st_brdf, jnp.float32(0))

    from gdpathtracing_tpu.render.sky import sample_sky

    def st_sky(c):
        d = Vec3(ray.d.x + c * 1e-12, ray.d.y, ray.d.z)
        s = sample_sky(d, cfg, scene)
        return s.x.sum()

    bench_scan("sample_sky", st_sky, jnp.float32(0))

    from gdpathtracing_tpu.render import lights as lm

    def st_nee(c):
        table = lm.build_light_table(scene)
        p = s_info.position
        p = Vec3(p.x + c * 1e-12, p.y, p.z)
        sd = seed
        (r1, r2), sd = rng.pcg2d(sd)
        (r3, _), sd = rng.pcg2d(sd)
        ls = lm.sample_light(table, p, r3, r1, r2)
        pl = lm.light_pdf_of_hit(table, scene, hit.inst, hit.tri,
                                 ray.d, hit.t + c * 1e-12)
        return ls.wi.x.sum() + pl.sum()

    bench_scan("NEE light math", st_nee, jnp.float32(0))

    e = scene.isect_mu.shape[1]
    idx0 = jnp.asarray(np.random.default_rng(0).integers(0, e, TILE),
                       jnp.int32)

    def st_rowgather(c):
        i = (idx0 + c.astype(jnp.int32)) % e
        return scene.isect_shade[i].sum()

    bench_scan("(N,16) row gather", st_rowgather, jnp.float32(0))

    def st_sgather(c):
        i = (idx0 + c.astype(jnp.int32)) % e
        return scene.isect_tri[i].sum().astype(jnp.float32) * 1e-9

    bench_scan("(N,) int gather", st_sgather, jnp.float32(0))

    def st_tex(c):
        i = (idx0 + c.astype(jnp.int32)) % e
        tex_idx = jnp.where(i % 2 == 0, -1, 0)
        col = sample_texture_array(scene.textures, tex_idx, hit.u, hit.v)
        return col.x.sum()

    bench_scan("texture bilinear", st_tex, jnp.float32(0))

    def st_matrows(c):
        i = (idx0 + c.astype(jnp.int32)) % scene.mat_albedo.shape[0]
        rows = jnp.concatenate([
            scene.mat_albedo, scene.mat_emission,
            scene.mat_emission_energy[:, None],
            scene.mat_metallic[:, None], scene.mat_roughness[:, None],
            scene.mat_tex.astype(jnp.float32)[:, None],
            scene.mat_transmission[:, None], scene.mat_ior[:, None],
            scene.mat_mr_tex.astype(jnp.float32)[:, None]], axis=1)[i]
        return rows.sum()

    bench_scan("(N,13) material row gather", st_matrows, jnp.float32(0))

    # dispatch-overhead check: same frame program dispatched 5x from host,
    # full AOVs pytree output (what bench.py does)
    step = jax.jit(lambda s, c, f: render_radiance(s, c, cfg, f))
    aovs = step(scene, camera, 0)
    np.asarray(aovs.radiance)
    t0 = time.time()
    for f in range(1, 6):
        aovs = step(scene, camera, f)
    np.asarray(aovs.radiance)
    dt = (time.time() - t0) / 5
    print(f"host-loop frame (AOVs out, 5x): {dt*1e3:.1f} ms/frame",
          flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
