"""Benchmark: Mrays/s/chip, primal, 1 spp @ 1080p on the demo scene
(BASELINE.md north-star metric). Prints ONE JSON line.

"Rays" = ray-trace queries actually issued (path segments), counted exactly
by the integrator's `segments` AOV — not the optimistic W*H*bounces.
vs_baseline is 1.0: the reference publishes no numbers (BASELINE.md), so
this benchmark IS the baseline series; the driver's BENCH_r{N}.json history
tracks round-over-round progress.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--traversal", default=None,
                    help="pallas|unit|brute|bvh (default pallas — the fused "
                         "chunk-culled kernel; measured 3.7 Mrays/s at "
                         "1080p vs 0.35 for the XLA megakernel paths)")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scene", default="demo", choices=["demo", "grid"],
                    help="demo = reference Cornell scene (~1.5k tris); "
                         "grid = 100-instance sphere grid (~100k tris)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gdpathtracing_tpu.config import RenderConfig, Traversal
    from gdpathtracing_tpu.render.renderer import render_radiance
    from gdpathtracing_tpu.scene.demo import (build_demo_scene, demo_camera,
                                              build_sphere_grid, grid_camera)

    traversal = Traversal(args.traversal) if args.traversal else Traversal.PALLAS

    if args.scene == "grid":
        scene = build_sphere_grid(n=10, sphere_detail=16)
        camera = grid_camera(args.width, args.height, n=10)
    else:
        scene = build_demo_scene(texture_resolution=64, sphere_detail=16)
        camera = demo_camera(args.width, args.height)
    config = RenderConfig(bounces=args.bounces, spp=args.spp,
                          traversal=traversal)

    step = jax.jit(lambda s, c, f: render_radiance(s, c, config, f))

    if args.verbose:
        print(f"compiling ({traversal.value}, {args.width}x{args.height}, "
              f"{args.bounces} bounces)...", file=sys.stderr)
    t0 = time.time()
    aovs = step(scene, camera, 0)
    aovs.radiance.block_until_ready()
    if args.verbose:
        print(f"compile+first frame: {time.time() - t0:.1f}s", file=sys.stderr)

    segments = float(np.asarray(aovs.segments, dtype=np.float64).sum())

    t0 = time.time()
    for f in range(1, args.frames + 1):
        aovs = step(scene, camera, f)
    # Full device→host transfer as the barrier: on this runtime
    # block_until_ready can return before execution completes.
    np.asarray(aovs.radiance)
    dt = time.time() - t0

    rays_per_s = segments * args.frames / dt
    mrays = rays_per_s / 1e6
    print(json.dumps({
        "metric": f"Mrays/s/chip primal {args.spp}spp "
                  f"{args.width}x{args.height} {traversal.value} "
                  f"{args.scene}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
