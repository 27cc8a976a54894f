"""Isolate render_radiance overhead vs raw path_trace at equal work.

bench_parts2 showed one full 2M-ray bounce (path_trace, single tile) costs
~61 ms, yet render_radiance at bounces=1 measured ~477 ms. Stages:

  d. render_radiance, tile_rays=2M (single tile, no lax.map)
  e. render_radiance, tile_rays=262144 (lax.map over 8 tiles)
  f. like d but returning only radiance (no AOV pytree reduction)

Usage: python -u examples/bench_parts3.py [--iters 10] [--bounces 1]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bounces", type=int, default=1)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gdpathtracing_tpu.config import RenderConfig, Traversal
    from gdpathtracing_tpu.render.renderer import render_radiance
    from gdpathtracing_tpu.scene.demo import build_demo_scene, demo_camera

    scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
    camera = demo_camera(args.width, args.height)

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
        print(f"{label}: {dt * 1e3:.2f} ms/frame", flush=True)
        return dt

    big = RenderConfig(bounces=args.bounces, spp=1,
                       traversal=Traversal.PALLAS, tile_rays=2097152)
    small = big.replace(tile_rays=262144)

    def stage_d(i):
        aovs = render_radiance(scene, camera, big, i)
        return (aovs.radiance.sum() + aovs.depth.sum()
                + aovs.steps.sum() + aovs.segments.sum()
                + aovs.normal.sum())

    def stage_e(i):
        aovs = render_radiance(scene, camera, small, i)
        return (aovs.radiance.sum() + aovs.depth.sum()
                + aovs.steps.sum() + aovs.segments.sum()
                + aovs.normal.sum())

    def stage_f(i):
        aovs = render_radiance(scene, camera, big, i)
        return aovs.radiance.sum()

    timeit(stage_d, f"d. render_radiance tile=2M b={args.bounces}")
    timeit(stage_e, f"e. render_radiance tile=256k b={args.bounces}")
    timeit(stage_f, f"f. tile=2M radiance-only")


if __name__ == "__main__":
    main()
