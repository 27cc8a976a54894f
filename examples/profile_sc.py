"""Superchunk kernel standalone on the 100k-tri grid scene (TPU)."""

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
from gdpathtracing_tpu.scene.demo import build_sphere_grid, grid_camera

W, H = 1920, 1080
TILE = 262144
K = 4


def timeit(fn, *args, iters=3):
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
    scene = build_sphere_grid(n=10, sphere_detail=16)
    camera = grid_camera(W, H, n=10)
    cfg = RenderConfig(bounces=5, spp=1, traversal=Traversal.PALLAS)
    e = scene.isect_mu.shape[1]
    print(f"E={e} chunks={e//256}", flush=True)

    noop = jax.jit(lambda c: c + 1.0)
    floor, _, _ = timeit(noop, jnp.float32(0.0))
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    pids = jnp.arange(TILE, dtype=jnp.int32)
    px = (pids % W).astype(jnp.uint32)
    py = (pids // W).astype(jnp.uint32)
    seed0 = rng.prng_seed(px, py, jnp.uint32(0))
    ray, _ = camera.generate_rays(pids, seed0, cfg)

    from gdpathtracing_tpu.ops.intersect_pallas import (
        prepare_trace_inputs, trace_pallas)
    prep = jax.jit(lambda s: prepare_trace_inputs(s))(scene)
    prep = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)) if hasattr(x, "shape") else x,
        prep)
    print("superchunks:", prep.superchunks, "E_pad:", prep.mu.shape[1],
          flush=True)

    @jax.jit
    def run(c):
        def body(c, _):
            r = Ray(Vec3(ray.o.x + c * 1e-12, ray.o.y, ray.o.z), ray.d)
            h = trace_pallas(scene, r, prep=prep)
            return h.t.sum(), ()
        c, _ = jax.lax.scan(body, c, None, length=K)
        return c

    t0 = time.time()
    v = float(np.asarray(run(jnp.float32(0))))
    print(f"compile {time.time()-t0:.1f}s chk {v:.4g}", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(jnp.float32(0)))
        ts.append(time.time() - t0)
    per = (min(ts) - floor) / K * 1e3
    print(f"sc trace 256k camera rays: {per:.2f} ms/iter "
          f"({TILE/per/1e3:.1f} Mrays/s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
