"""Stage-by-stage timing of one PALLAS bounce at full wavefront size.

Isolates the ~400 ms/frame of non-kernel cost seen by bench_parts.py:
  a. raygen (pcg2d seed + camera unproject)
  b. raygen + trace_pallas (kernel + HitInfo assembly)
  c. raygen + one full integrator bounce (path_trace bounces=1, one tile)
Deltas give each stage. Same in-graph scan discipline as bench_parts.

Usage: python -u examples/bench_parts2.py [--n 2097152] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gdpathtracing_tpu.config import RenderConfig, Traversal
    from gdpathtracing_tpu.core import rng as rng_mod
    from gdpathtracing_tpu.ops import intersect_pallas as ip
    from gdpathtracing_tpu.render.integrator import get_trace_fn, path_trace
    from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(args.width, args.height)
    n = args.n
    cfg1 = RenderConfig(bounces=1, spp=1, traversal=Traversal.PALLAS,
                        tile_rays=n)
    trace_fn = get_trace_fn(cfg1, scene)
    pids = jnp.arange(n, dtype=jnp.int32) % (args.width * args.height)
    px = (pids % args.width).astype(jnp.uint32)
    py = (pids // args.width).astype(jnp.uint32)

    def raygen(i):
        seed = rng_mod.prng_seed(px, py, jnp.uint32(0) + i.astype(jnp.uint32))
        ray, seed = camera.generate_rays(pids, seed, cfg1)
        return ray, seed

    def stage_a(i):
        ray, _ = raygen(i)
        return ray.o.x.min() + ray.d.x.min()

    def stage_b(i):
        ray, _ = raygen(i)
        hit = trace_fn(scene, ray, None)
        return hit.t.min()

    def stage_c(i):
        ray, seed = raygen(i)
        res = path_trace(scene, ray, seed, cfg1, trace_fn, far=camera.far)
        return res.radiance.x.min() + res.depth.min()

    def timeit(fn, label):
        @jax.jit
        def run():
            def body(c, i):
                return fn(i + (c * 1e-30).astype(jnp.int32)
                          ).astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(args.iters))
            return c

        t0 = time.time()
        np.asarray(run())
        print(f"{label}: compile+warm {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(run())
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.2f} ms per {n} rays", flush=True)
        return dt

    a = timeit(stage_a, "a. raygen")
    b = timeit(stage_b, "b. raygen+trace")
    c = timeit(stage_c, "c. raygen+bounce")
    print(f"trace alone: {(b - a) * 1e3:.1f} ms; "
          f"shade/sample glue: {(c - b) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
