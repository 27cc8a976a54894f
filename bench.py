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

    # All frames run inside ONE jitted program (lax.scan): per-dispatch
    # tunnel latency (~25 ms floor, ~300 ms for multi-output pytrees on
    # this runtime) never pollutes the compute measurement. The barrier is
    # a full device→host transfer of the last frame's radiance —
    # block_until_ready can return early on this runtime.
    #
    # Exception: the grid scene times a per-frame host loop — its frames
    # are seconds (floor error <3%), and the frame-scan + superchunk
    # kernel combination at 1080p crashes the TPU worker (runtime bug,
    # see docs/STATUS.md).
    import jax.numpy as jnp

    if args.scene == "grid":
        step = jax.jit(lambda s, c, f:
                       render_radiance(s, c, config, f))
        if args.verbose:
            print("compiling (grid, host-loop timing)...", file=sys.stderr)
        t0 = time.time()
        aovs = step(scene, camera, 0)
        rad_np = np.asarray(aovs.radiance)
        assert np.isfinite(rad_np).all()
        if args.verbose:
            print(f"compile+first frame: {time.time() - t0:.1f}s",
                  file=sys.stderr)
        # Segment count is measured on frame 0 and assumed representative
        # of the timed frames (per-frame variation is ~1% — paths differ
        # only by RNG); the median frame time keeps one slow outlier from
        # skewing the quotient.
        segments = float(np.asarray(aovs.segments, np.float64).sum())
        dts = []
        for f in range(1, args.frames + 1):
            t0 = time.time()
            np.asarray(step(scene, camera, f).radiance)
            dts.append(time.time() - t0)
        dt = sorted(dts)[len(dts) // 2]
        if args.verbose:
            print(f"{dt*1e3:.1f} ms/frame ({segments/1e6:.2f} M segments)",
                  file=sys.stderr)
        print(json.dumps({
            "metric": f"Mrays/s/chip primal {args.spp}spp "
                      f"{args.width}x{args.height} {traversal.value} grid",
            "value": round(segments / dt / 1e6, 3),
            "unit": "Mrays/s",
            "vs_baseline": 1.0,
        }))
        return

    @jax.jit
    def run(s, c, frames):
        def body(carry, f):
            aovs = render_radiance(s, c, config, f)
            # Carry the image (donated in place) instead of stacking
            # per-frame AOVs — stacked multi-frame outputs measured
            # pathologically slow on this runtime.
            return (aovs.radiance, aovs.segments), ()
        (rad, segs), _ = jax.lax.scan(
            body, (jnp.zeros((c.height, c.width, 3), jnp.float32),
                   jnp.zeros((c.height, c.width), jnp.int32)),
            jnp.asarray(frames, jnp.uint32))
        return rad, segs

    if args.verbose:
        print(f"compiling ({traversal.value}, {args.width}x{args.height}, "
              f"{args.bounces} bounces)...", file=sys.stderr)
    t0 = time.time()
    rad, segs = run(scene, camera, [0] * args.frames)
    rad_np = np.asarray(rad)
    assert np.isfinite(rad_np).all()
    if args.verbose:
        print(f"compile+warmup ({args.frames} frames): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

    segments = float(np.asarray(segs, dtype=np.float64).sum())

    t0 = time.time()
    rad, _ = run(scene, camera, list(range(1, args.frames + 1)))
    np.asarray(rad)
    dt = time.time() - t0
    if args.verbose:
        print(f"{dt / args.frames * 1e3:.1f} ms/frame "
              f"({segments/1e6:.2f} M segments)", file=sys.stderr)

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
