"""Pin down the frame-scan carry pathology on this runtime.

parts3: scalar-carry scan of render_radiance(b=1) = 57 ms/frame.
bench_parts/bench.py image-carry scan of the same = 477 ms/frame.
Stages (all bounces=1 unless noted, default tiling):

  g. accumulate-image scan: carry (H,W,3), acc += radiance  (progressive)
  h. replace-image scan: carry (radiance, segments) exactly like bench.py
  i. scalar-sum scan at bounces=5 (the honest 5-bounce frame cost)
  j. like h but radiance only (is the multi-array carry the problem?)

Usage: python -u examples/bench_parts4.py [--iters 10]
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
    h, w = args.height, args.width
    cfg1 = RenderConfig(bounces=1, spp=1, traversal=Traversal.PALLAS)
    cfg5 = cfg1.replace(bounces=5)

    def bench(run, label):
        t0 = time.time()
        np.asarray(run())
        print(f"{label}: compile+warm {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(run())
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.2f} ms/frame", flush=True)

    frames = jnp.arange(args.iters, dtype=jnp.uint32)

    @jax.jit
    def run_g():
        def body(acc, f):
            aovs = render_radiance(scene, camera, cfg1, f)
            return acc + aovs.radiance, None
        acc, _ = jax.lax.scan(body, jnp.zeros((h, w, 3), jnp.float32),
                              frames)
        return acc[0, 0, 0]

    @jax.jit
    def run_h():
        def body(carry, f):
            aovs = render_radiance(scene, camera, cfg1, f)
            return (aovs.radiance, aovs.segments), ()
        (rad, segs), _ = jax.lax.scan(
            body, (jnp.zeros((h, w, 3), jnp.float32),
                   jnp.zeros((h, w), jnp.int32)), frames)
        return rad[0, 0, 0]

    @jax.jit
    def run_i():
        def body(c, f):
            aovs = render_radiance(scene, camera, cfg5, f)
            return aovs.radiance.sum() + c * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), frames)
        return c

    @jax.jit
    def run_j():
        def body(carry, f):
            aovs = render_radiance(scene, camera, cfg1, f)
            return aovs.radiance, ()
        rad, _ = jax.lax.scan(body, jnp.zeros((h, w, 3), jnp.float32),
                              frames)
        return rad[0, 0, 0]

    bench(run_g, "g. accumulate-image carry b=1")
    bench(run_h, "h. bench.py-style carry b=1")
    bench(run_i, "i. scalar-sum b=5")
    bench(run_j, "j. replace-image carry b=1")


if __name__ == "__main__":
    main()
