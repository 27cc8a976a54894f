"""Stage-level TPU profile of the 1080p demo frame.

Times, with honest barriers (np.asarray of a SCALAR checksum computed
in-graph — forcing full execution — plus a separate measurement of the raw
device->host transfer so tunnel bandwidth never pollutes compute timings):

  - full frame (pallas backend), per-frame
  - device->host transfer of the (H,W,3) radiance image
  - closest-hit kernel (raw) and trace_pallas wrapper (kernel + epilogue)
  - occlusion kernel
  - shading fetch (get_shading_data_fast) on real first-hit data
  - BRDF sample/eval/pdf chain
  - NEE light-sampling math (no occlusion)
  - gather microbenches: (N,16) row gather, (N,) scalar gather

Run: nohup python -u examples/profile_frame.py > /tmp/profile.log 2>&1 &
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
from gdpathtracing_tpu.render.shading import get_shading_data_fast
from gdpathtracing_tpu.render.types import HitInfo, Ray
from gdpathtracing_tpu.core.vec import Vec3
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080
N = W * H
TILE = 262144  # config default tile size — per-stage arrays use this


def bench(name, fn, *args, iters=5):
    """fn must return a jax scalar; barrier = transfer of that scalar."""
    # warmup/compile
    t0 = time.time()
    v = float(np.asarray(fn(*args)))
    print(f"{name:42s} compile+1st {time.time()-t0:7.2f}s "
          f"(checksum {v:.6g})", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:42s} min {min(ts)*1e3:9.2f} ms   "
          f"med {sorted(ts)[len(ts)//2]*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    print("devices:", jax.devices(), flush=True)
    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)

    e = scene.isect_mu.shape[1]
    print(f"expanded tris E={e}, chunks={e//256}", flush=True)

    # ---- full frame, checksum barrier --------------------------------
    @jax.jit
    def frame_sum(s, c, f):
        aovs = render_radiance(s, c, cfg, f)
        return aovs.radiance.sum() + aovs.segments.sum()

    bench("frame (pallas, nee=off, 5b)", frame_sum, scene, camera, 1)

    # segments for Mrays/s accounting
    aovs = jax.jit(lambda s, c, f: render_radiance(s, c, cfg, f))(
        scene, camera, 0)
    segs = float(np.asarray(aovs.segments, dtype=np.float64).sum())
    print(f"segments/frame = {segs/1e6:.3f} M", flush=True)

    # ---- transfer cost of the full image -----------------------------
    rad = aovs.radiance
    np.asarray(rad)  # ensure materialized
    for _ in range(3):
        t0 = time.time()
        np.asarray(rad)
        print(f"transfer (H,W,3) f32 ({rad.nbytes/1e6:.0f} MB): "
              f"{(time.time()-t0)*1e3:.1f} ms", flush=True)

    # ---- camera rays at tile size ------------------------------------
    pids = jnp.arange(TILE, dtype=jnp.int32)
    px = (pids % W).astype(jnp.uint32)
    py = (pids // W).astype(jnp.uint32)
    seed0 = rng.prng_seed(px, py, jnp.uint32(0))
    ray, seed = camera.generate_rays(pids, seed0, cfg)
    ray = jax.tree.map(jnp.asarray, ray)
    active = jnp.ones(TILE, bool)

    from gdpathtracing_tpu.ops.intersect_pallas import (
        _closest_hit, occluded_pallas, trace_pallas)

    # raw kernel inputs
    o4t = jnp.stack([ray.o.x, ray.o.y, ray.o.z, ray.o.x * 0 + 1.0], axis=0)
    d4t = jnp.stack([ray.d.x, ray.d.y, ray.d.z, ray.d.x * 0], axis=0)

    @jax.jit
    def raw_kernel(o4t, d4t):
        t, idx = _closest_hit(o4t, d4t, scene.isect_chunk_bounds,
                              scene.isect_mu, scene.isect_mv, scene.isect_mw)
        return t.sum() + idx.sum()

    bench(f"closest-hit kernel raw ({TILE//1024}k rays)",
          raw_kernel, o4t, d4t)

    @jax.jit
    def wrapper(r, a):
        h = trace_pallas(scene, r, a)
        return h.t.sum() + h.u.sum() + h.v.sum() + h.tri.sum() + \
            h.inst.sum() + h.front.sum()

    bench("trace_pallas wrapper (kernel+epilogue)", wrapper, ray, active)

    # occlusion
    tmax = jnp.full(TILE, 10.0, jnp.float32)

    @jax.jit
    def occl(r, tm, a):
        return occluded_pallas(scene, r, tm, a).sum()

    bench("occlusion kernel (wrapper)", occl, ray, tmax, active)

    # ---- real first-hit data for shading stage -----------------------
    hit = jax.jit(lambda r, a: trace_pallas(scene, r, a))(ray, active)
    hit = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), hit)

    @jax.jit
    def shading(h, r):
        s = get_shading_data_fast(scene, h, r)
        return (s.position.x.sum() + s.normal.x.sum() + s.emission.x.sum()
                + s.diffuse_albedo.x.sum() + s.roughness.sum()
                + s.fresnel_0.x.sum() + s.transmission.sum())

    bench("get_shading_data_fast", shading, hit, ray)

    s_info = jax.jit(lambda h, r: get_shading_data_fast(scene, h, r))(
        hit, ray)
    s_info = jax.tree.map(jnp.asarray, s_info)

    # ---- BRDF chain ---------------------------------------------------
    @jax.jit
    def brdf_chain(s, sd):
        (r1, r2), sd = rng.pcg2d(sd)
        nd = brdf.sample_brdf(s, r1, r2)
        pdf = brdf.brdf_pdf(s, nd)
        f = brdf.eval_brdf(s, nd)
        return nd.x.sum() + pdf.sum() + f.x.sum()

    bench("brdf sample+pdf+eval", brdf_chain, s_info, seed)

    # ---- sky ----------------------------------------------------------
    from gdpathtracing_tpu.render.sky import sample_sky

    @jax.jit
    def sky_fn(d):
        s = sample_sky(d, cfg, scene)
        return s.x.sum() + s.y.sum() + s.z.sum()

    bench("sample_sky", sky_fn, ray.d)

    # ---- NEE light math (demo scene with nee would need lights; the
    # demo scene has emissive surfaces -> n_lights > 0) ------------------
    if scene.n_lights > 0:
        from gdpathtracing_tpu.render import lights as lm
        print(f"n_lights = {scene.n_lights}", flush=True)

        @jax.jit
        def nee_math(s, h, r, sd):
            table = lm.build_light_table(scene)
            (r1, r2), sd = rng.pcg2d(sd)
            (r3, _), sd = rng.pcg2d(sd)
            ls = lm.sample_light(table, s.position, r3, r1, r2)
            pl = lm.light_pdf_of_hit(table, scene, h.inst, h.tri, r.d, h.t)
            return ls.wi.x.sum() + ls.pdf_solid.sum() + pl.sum()

        bench("NEE light math (sample+pdf_of_hit)", nee_math,
              s_info, hit, ray, seed)

    # ---- gather microbenches ------------------------------------------
    idx = jnp.asarray(np.random.default_rng(0).integers(0, e, TILE),
                      jnp.int32)

    @jax.jit
    def row_gather(i):
        return scene.isect_shade[i].sum()

    bench("(N,16) row gather (random idx)", row_gather, idx)

    @jax.jit
    def scal_gather(i):
        return scene.isect_tri[i].sum()

    bench("(N,) int gather (random idx)", scal_gather, idx)

    @jax.jit
    def tex_fetch(i, u, v):
        from gdpathtracing_tpu.render.shading import sample_texture_array
        tex_idx = jnp.where(i % 2 == 0, -1, 0)
        c = sample_texture_array(scene.textures, tex_idx, u, v)
        return c.x.sum() + c.y.sum() + c.z.sum()

    bench("texture bilinear (mixed tex/untex)", tex_fetch, idx,
          hit.u, hit.v)

    print("done", flush=True)


if __name__ == "__main__":
    main()
