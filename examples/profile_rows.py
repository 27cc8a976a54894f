"""Compare _closest_hit (t/idx kernel) vs _closest_hit_rows on TPU,
amortized. Usage: python -u examples/profile_rows.py"""

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

    noop = jax.jit(lambda c: c + 1.0)
    floor, _, _ = timeit(noop, jnp.float32(0.0))
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    pids = jnp.arange(TILE, dtype=jnp.int32)
    px = (pids % W).astype(jnp.uint32)
    py = (pids // W).astype(jnp.uint32)
    seed0 = rng.prng_seed(px, py, jnp.uint32(0))
    ray, _ = camera.generate_rays(pids, seed0, cfg)

    from gdpathtracing_tpu.ops.intersect_pallas import (
        _closest_hit, _closest_hit_rows, build_trace_table)

    tab = jax.jit(build_trace_table)(scene)
    tab = jnp.asarray(np.asarray(tab))

    def scan_bench(name, step):
        @jax.jit
        def run(c):
            def body(c, _):
                return step(c), ()
            c, _ = jax.lax.scan(body, c, None, length=K)
            return c
        tmin, comp, v = timeit(run, jnp.float32(0))
        per = (tmin - floor) / K * 1e3
        print(f"{name:40s} {per:9.2f} ms/iter (compile {comp:5.1f}s, "
              f"chk {v:.4g})", flush=True)

    def perturb(c):
        return Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)

    def st_old(c):
        r = perturb(c)
        o4t = jnp.stack([r.o.x, r.o.y, r.o.z, r.o.x * 0 + 1], axis=0)
        d4t = jnp.stack([r.d.x, r.d.y, r.d.z, r.d.x * 0], axis=0)
        t, idx = _closest_hit(o4t, d4t, scene.isect_chunk_bounds,
                              scene.isect_mu, scene.isect_mv, scene.isect_mw)
        return t.sum()

    def st_rows(c):
        r = perturb(c)
        o4t = jnp.stack([r.o.x, r.o.y, r.o.z, r.o.x * 0 + 1], axis=0)
        d4t = jnp.stack([r.d.x, r.d.y, r.d.z, r.d.x * 0], axis=0)
        rows = _closest_hit_rows(o4t, d4t, scene.isect_chunk_bounds,
                                 scene.isect_mu, scene.isect_mv,
                                 scene.isect_mw, tab)
        return rows[40].sum()

    scan_bench("closest-hit t/idx kernel", st_old)
    scan_bench("closest-hit rows kernel", st_rows)
    print("done", flush=True)


if __name__ == "__main__":
    main()
