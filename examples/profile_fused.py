"""Amortized (K-in-graph-repeats) comparison of traversal/megakernel
variants on the demo scene — redoing the round-1 fused-vs-wavefront
decision with dispatch-floor-free timing.

Run: nohup python -u examples/profile_fused.py > /tmp/profile_fused.log 2>&1 &
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
from gdpathtracing_tpu.render.renderer import render_radiance
from gdpathtracing_tpu.render.types import Ray
from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

W, H = 1920, 1080
TILE = 262144
K = 8


def timeit(fn, *args, iters=4):
    t0 = time.time()
    v = float(np.asarray(fn(*args)))
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), comp, v


def main():
    print("devices:", jax.devices(), flush=True)
    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(W, H)
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)
    cfg_fused = RenderConfig(bounces=5, spp=1, traversal=Traversal.FUSED)

    noop = jax.jit(lambda c: c + 1.0)
    floor, _, _ = timeit(noop, jnp.float32(0.0))
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    pids = jnp.arange(TILE, dtype=jnp.int32)
    px = (pids % W).astype(jnp.uint32)
    py = (pids // W).astype(jnp.uint32)
    seed0 = rng.prng_seed(px, py, jnp.uint32(0))
    ray, seed = camera.generate_rays(pids, seed0, cfg)

    def perturb(c):
        return Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)

    from gdpathtracing_tpu.ops.intersect_pallas import (_closest_hit,
                                                        _closest_hit_loop)

    def scan_bench(name, step):
        @jax.jit
        def run(c):
            def body(c, _):
                return step(c), ()
            c, _ = jax.lax.scan(body, c, None, length=K)
            return c
        tmin, comp, v = timeit(run, jnp.float32(0))
        per = (tmin - floor) / K * 1e3
        mrays = TILE / (per * 1e-3) / 1e6 if per > 0 else float("inf")
        print(f"{name:40s} {per:9.2f} ms/iter ({mrays:7.1f} Mrays/s; "
              f"compile {comp:5.1f}s, chk {v:.4g})", flush=True)
        return per

    def mk_kernel_step(kfn):
        def step(c):
            r = perturb(c)
            o4t = jnp.stack([r.o.x, r.o.y, r.o.z, r.o.x * 0 + 1], axis=0)
            d4t = jnp.stack([r.d.x, r.d.y, r.d.z, r.d.x * 0], axis=0)
            t, idx = kfn(o4t, d4t, scene.isect_chunk_bounds,
                         scene.isect_mu, scene.isect_mv, scene.isect_mw)
            return t.sum()
        return step

    scan_bench("closest-hit grid-step (256k camera)",
               mk_kernel_step(_closest_hit))
    scan_bench("closest-hit fori+cond loop (256k)",
               mk_kernel_step(_closest_hit_loop))

    from gdpathtracing_tpu.ops.fused_pallas import path_trace_fused

    def fused_tile(c):
        r = perturb(c)
        res = path_trace_fused(scene, r, seed, cfg_fused)
        return res.radiance.x.sum()

    scan_bench("fused 5-bounce megakernel (256k tile)", fused_tile)

    # full frames, 2-frame in-graph scans
    for name, c in (("frame PALLAS", cfg), ("frame FUSED", cfg_fused)):
        @jax.jit
        def frames2(z, c=c):
            def body(z, f):
                aovs = render_radiance(scene, camera, c, f)
                return z + aovs.radiance.sum() + aovs.segments.sum() * 1e-9,\
                    ()
            z, _ = jax.lax.scan(body, z, jnp.arange(2, dtype=jnp.uint32))
            return z
        tmin, comp, v = timeit(frames2, jnp.float32(0))
        print(f"{name:40s} {(tmin-floor)/2*1e3:9.1f} ms/frame "
              f"(compile {comp:5.1f}s, chk {v:.6g})", flush=True)

    # segments for both
    for name, c in (("PALLAS", cfg), ("FUSED", cfg_fused)):
        aovs = jax.jit(lambda s, cam, f, c=c: render_radiance(s, cam, c, f)
                       )(scene, camera, 0)
        segs = float(np.asarray(aovs.segments, dtype=np.float64).sum())
        print(f"segments {name}: {segs/1e6:.3f} M", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
